#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB (with each fixture table
registered as a view over <sfDir>/<table>.parquet), and compares:
  - schema (column names, sorted)
  - row count
  - values: rows sorted, columns sorted by name, floats compared exactly
    after both sides' round(4) convention (plus a tiny-epsilon fallback
    reported separately so we can spot near-misses).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # normalize dates/timestamps to strings
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + ("" if len(got) else " !!EMPTY")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH got={len(g)} exp={len(e)}"
            continue
        bad = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            if np.issubdtype(gc.dtype, np.floating) or np.issubdtype(ec.dtype, np.floating):
                gv = gc.astype(float).to_numpy()
                ev = ec.astype(float).to_numpy()
                both_nan = np.isnan(gv) & np.isnan(ev)
                eq = np.isclose(gv, ev, rtol=0, atol=0, equal_nan=True)
                near = np.isclose(gv, ev, rtol=1e-9, atol=1e-9, equal_nan=True)
                if not (eq | both_nan).all():
                    tag = "NEAR" if (near | both_nan).all() else "FAR"
                    i = int(np.argmax(~(eq | both_nan)))
                    bad.append(f"{c}[{tag}]@{i}: {gv[i]!r} vs {ev[i]!r}")
            else:
                if not gc.astype(str).equals(ec.astype(str)):
                    i = int((gc.astype(str) != ec.astype(str)).idxmax())
                    bad.append(f"{c}@{i}: {gc[i]!r} vs {ec[i]!r}")
        if bad:
            results[name] = "VALUE_MISMATCH " + "; ".join(bad[:3])
        else:
            # also verify raw row order agreement (driver may hash in order)
            go = got.reindex(sorted(got.columns), axis=1).astype(str).reset_index(drop=True)
            eo = exp.reindex(sorted(exp.columns), axis=1).astype(str).reset_index(drop=True)
            order = "" if go.equals(eo) else " ORDER_DIFF"
            results[name] = "OK rows=%d%s" % (len(g), order)
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
    print(f"-- {n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
