package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-selection operators for training-data pipelines:
  * hash-based sampling, per-key quotas, weighted interleaving, and
  * reproducible shuffling.
  *
  * All of them derive decisions from a cryptographic hash of a stable key
  * (never from RNG state), so:
  *   - re-runs, retries, and engine versions agree row-for-row;
  *   - the same doc keeps the same fate as the corpus grows (consistent
  *     sampling — adding data never resamples old rows);
  *   - every operator is a pure map/filter over the scan (no shuffle), and
  *     results are cross-engine verifiable (md5 is md5 everywhere).
  *
  * The hex-prefix comparison trick: the first 4 hex chars of md5 are
  * uniform over [0, 65536); `prefix < printf("%04x", frac·65536)` keeps a
  * `frac` fraction, deterministically, with lexicographic string compare
  * only (portable across engines without big-int hex parsing).
  */
object Sampling {

  /** Lowercase-hex md5 of a column's UTF-8 string form. */
  def hashKey(c: Column): Column = md5(c.cast("string").cast("binary"))

  /** 4-hex-digit sampling threshold for `frac` (shared with oracle SQL). */
  def hexThreshold(frac: Double): String =
    f"${math.round(frac * 65536).toInt.min(65535)}%04x"

  /** Condition: row is in the `frac` sample keyed by `c`. */
  def inHashSample(c: Column, frac: Double): Column =
    substring(hashKey(c), 1, 4) < lit(hexThreshold(frac))

  /** Deterministic `frac` sample of `df` keyed by `keyCol` — the
    * train/holdout splitter of a data pipeline. One scan, no shuffle,
    * consistent under corpus growth.
    */
  def hashSample(df: DataFrame, keyCol: String, frac: Double): DataFrame =
    df.filter(inHashSample(col(keyCol), frac))

  /** EXACT-k deterministic uniform sample: take the k smallest rows in
    * hash order of the key (md5 — uniform over keys, RNG-free, stable
    * across runs and engines). A rate sample (`hashSample`) can't hit a
    * row budget exactly; this can, and it plans as
    * TakeOrderedAndProject — per-partition k-heaps, never a global
    * sort — so "give me exactly 100k eval docs" stays one scan at any
    * corpus size. Ties on the hash break by the key itself.
    */
  def exactKSample(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.orderBy(hashKey(col(keyCol)), col(keyCol)).limit(k)

  /** Exact-budget stratified sample: Hamilton (largest-remainder)
    * allocation of `budget` across strata proportional to their row
    * counts — floor(budget·c_s/N) each, the leftover seats going to the
    * largest remainders (stratum-name tiebreak) — then the k_s
    * hash-smallest keys per stratum. All allocation arithmetic is exact
    * BigInt, so any engine recomputing it (the DuckDB oracle does, in
    * HUGEINT) lands on identical k_s; the output size is EXACTLY
    * `budget` whenever every stratum can fill its seats. The stratum
    * census collected here is metadata-scale (one row per stratum), the
    * mixtureThresholds pattern.
    */
  def stratifiedExactK(df: DataFrame, stratumCol: String, keyCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(df.schema(stratumCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"$stratumCol must be a string stratum column (got " +
        s"${df.schema(stratumCol).dataType.simpleString}); cast it first")
    val counts = df.groupBy(col(stratumCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "empty input: nothing to allocate")
    require(counts.forall(_._1 != null), s"$stratumCol contains NULLs")
    val n = BigInt(counts.map(_._2).sum)
    val base = counts.map { case (s, c) => s -> (BigInt(budget) * c / n) }
    val leftover = (BigInt(budget) - base.map(_._2).sum).toInt
    val bumped = counts
      .map { case (s, c) => s -> (BigInt(budget) * c % n) }
      .sortBy { case (s, r) => (-r, s) }
      .take(leftover).map(_._1).toSet
    val ks = base.map { case (s, b) =>
      s -> (b.toLong + (if (bumped(s)) 1L else 0L))
    }.toMap
    val ksCol = ks.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(col(stratumCol) === s, lit(k)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= ksCol)
      .drop("__rn")
  }

  /** Weighted sampling without replacement, deterministically keyed
    * (Efraimidis-Spirakis A-Res): each row gets key u^(1/w) with u the
    * hash-uniform variate of `keyCol` and w = `weightCol` (> 0); the k
    * LARGEST keys are an exact weighted sample without replacement. No
    * RNG — the same row keeps the same key forever, so the sample is
    * reproducible and oracle-checkable. Plans as TakeOrderedAndProject
    * (per-partition k-heaps), never a global sort.
    */
  def weightedSampleK(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = (hexVal(col(keyCol)) + lit(0.5)) / lit(65536.0)
    // w ≤ 0 is undefined under u^(1/w) (engines disagree: NULL vs
    // Infinity; a negative w would outrank every legitimate row) — such
    // rows have zero selection probability by definition, so exclude
    // them rather than let corrupt weights poison the sample.
    // Rank on the 6dp-rounded key (keyCol tiebreak): JVM Math.pow and a
    // foreign engine's libm pow are not ULP-identical, so an unrounded
    // near-tie at the k boundary could pick different rows per engine.
    df.filter(col(weightCol) > 0)
      .withColumn("wkey", pow(u, lit(1.0) / col(weightCol)))
      .orderBy(round(col("wkey"), 6).desc, col(keyCol))
      .limit(k)
  }

  /** Deterministic contrastive-pair construction (embedding-training
    * data prep): within each group, order rows by the hash-uniform
    * variate of `keyCol` and pair rank 2k−1 with rank 2k — a
    * reproducible random-but-fixed matching, no RNG, no rejection
    * sampling. Odd leftovers per group drop. One per-group window, no
    * self-join; scales with group cardinality like every window here.
    */
  def contrastivePairs(df: DataFrame, groupCol: String,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hexVal(col(keyCol)), col(keyCol))
    df.select(col(groupCol), col(keyCol))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__nxt", lead(col(keyCol), 1).over(w))
      .filter(col("__rk") % 2 === 1 && col("__nxt").isNotNull)
      .select(col(groupCol), col(keyCol).as("anchor_id"),
        col("__nxt").as("pair_id"))
  }

  /** Cap each key's rows at `k`, keeping the smallest `orderCol` values —
    * the per-domain/per-source quota of a corpus mix. Runs on the custom
    * two-phase TopKPerKey operator: map-side k-heaps, one key exchange,
    * never a full per-key sort.
    */
  def perKeyQuota(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int): DataFrame =
    graft.plans.TopK.perKey(df, keyCols, orderCol, k, descending = false)

  /** Weighted interleave: per-arm sampling fractions keyed by the row key —
    * e.g. Map("en" -> 0.5, "*" -> 0.25) upsamples English 2:1. Arms are
    * decided by `armCol` with `"*"` as the default arm. Pure filter.
    */
  def weightedInterleave(df: DataFrame, armCol: String, keyCol: String,
      weights: Map[String, Double]): DataFrame = {
    val default = weights.getOrElse("*", 0.0)
    val cond = weights.filterNot(_._1 == "*").foldLeft(
      when(lit(false), lit(false))) { case (acc, (arm, frac)) =>
        acc.when(col(armCol) === arm, inHashSample(col(keyCol), frac))
    }.otherwise(inHashSample(col(keyCol), default))
    df.filter(cond)
  }

  /** Reproducible global shuffle key: ordering by it randomizes row order
    * deterministically (the pre-training shuffle). At scale this is a
    * spillable distributed sort — callers `.orderBy(col("shuffle_key"))`
    * then write with `maxRecordsPerFile`; no single-partition window, no
    * rank column needed.
    */
  def withShuffleKey(df: DataFrame, keyCol: String,
      outCol: String = "shuffle_key"): DataFrame =
    df.withColumn(outCol, hashKey(col(keyCol)))

  /** Deterministic n-way split assignment (train/val/test): `cuts` are
    * (label, cumulativeFraction) in increasing order; rows land in the
    * first band their hash falls under, `defaultLabel` catches the rest.
    * Same hex-prefix variate as `hashSample`, so splits NEST with any
    * sample taken on the same key and stay stable as the corpus grows —
    * no doc ever migrates between train and test on a re-run.
    */
  def splitColumn(keyCol: Column, cuts: Seq[(String, Double)],
      defaultLabel: String): Column = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be increasing")
    val h = substring(hashKey(keyCol), 1, 4)
    cuts.foldRight(lit(defaultLabel): Column) { case ((label, frac), rest) =>
      when(h < lit(hexThreshold(frac)), lit(label)).otherwise(rest)
    }
  }

  // ------------------------------------------------- mixture reweighting

  /** Numeric value of the first 4 hex chars of the sampling hash — the
    * same uniform [0, 65536) variate as the hex-prefix compare, but as a
    * number so per-row thresholds can vary by group.
    */
  def hexVal(c: Column): Column =
    conv(substring(hashKey(c), 1, 4), 16, 10).cast("long")

  /** Per-source acceptance thresholds (out of 65536) that reshape the
    * observed source mix toward target weights under a global budget.
    *
    * rate_s = min(1, budget · w_s·N / (W·c_s)) — i.e. source `s` should
    * contribute a `w_s/W` share of a `budget·N`-doc corpus; sources with
    * fewer docs than their target share keep everything (rate capped at
    * 1). budget is the rational `budgetNum/budgetDen`; thresholds are
    * floor(rate·65536) computed in exact BigInt arithmetic so any engine
    * recomputing them (the DuckDB oracle does, in HUGEINT) lands on
    * identical integers — no floating-point boundary drift.
    *
    * The groupBy(source).count() collected here is metadata-scale (one
    * row per DOMAIN, not per doc — dozens of rows at 100 TB), same
    * bounded-probe pattern as Packing's min/max scan.
    */
  def mixtureThresholds(df: DataFrame, sourceCol: String,
      weightOf: String => Long, budgetNum: Long, budgetDen: Long): Map[String, Long] = {
    require(budgetNum > 0 && budgetDen > 0, "budget must be positive")
    val counts = df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.keys.forall(_ != null),
      s"$sourceCol contains NULL values — filter or impute them before reweighting")
    val n = BigInt(counts.values.sum)
    val w = counts.keys.map(s => s -> BigInt(weightOf(s))).toMap
    require(w.values.forall(_ > 0), "weights must be positive")
    val wSum = w.values.sum
    counts.map { case (s, c) =>
      val thr = (BigInt(65536) * budgetNum * w(s) * n) /
        (BigInt(budgetDen) * wSum * c)
      s -> thr.min(BigInt(65536)).toLong
    }
  }

  /** Domain-mixture reweighting: deterministic per-source downsampling to
    * target mixture weights (the DoReMi/data-mix curation step). One
    * metadata-scale counting pass, then a pure broadcast-map filter over
    * the scan — no per-doc shuffle, consistent under re-runs.
    */
  def mixtureReweight(df: DataFrame, sourceCol: String, keyCol: String,
      weightOf: String => Long, budgetNum: Long, budgetDen: Long): DataFrame = {
    val thr = mixtureThresholds(df, sourceCol, weightOf, budgetNum, budgetDen)
    val thrCol = thr.foldLeft(lit(0L)) { case (acc, (s, t)) =>
      when(col(sourceCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(hexVal(col(keyCol)) < thrCol)
  }
}
