package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
