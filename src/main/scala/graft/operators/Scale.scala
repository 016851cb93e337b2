package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities that only pay off beyond a single node — skew
  * handling, approximate aggregates, co-location. Small-SF specs verify
  * semantics; the point of each is its behavior at 100 TB.
  */
object Scale {

  /** Skew-salted equi-join: the large (skewed) side gets a random-but-
    * deterministic salt in [0, saltFactor); the small side is replicated
    * once per salt value. The shuffle key becomes (key, salt), splitting a
    * hot key's rows across saltFactor reducers instead of one straggler.
    *
    * Use when AQE's skew-join split isn't available (e.g., the skew is in
    * an aggregation feeding the join) or the hot keys are known to exceed
    * what AQE subdivides. Salt is hash-derived from the whole row of the
    * large side → deterministic re-runs.
    *
    * Join types are restricted to the large-side-preserving set: with the
    * small side replicated `saltFactor`×, a right/full outer join would
    * emit every UNMATCHED small-side row once per salt value — duplicated
    * output. Inner/left/semi/anti are exact because every emitted row is
    * driven by exactly one salted large-side row.
    */
  private val saltSafeJoinTypes = // normalized: lowercase, no underscores
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    require(saltSafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports large-side-preserving join types only; got " +
        s"'$joinType' — a right/full outer join would emit unmatched " +
        "small-side rows once per salt value")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Approximate distinct count (HyperLogLog++, Heule/Nunkesser/Hall,
    * EDBT 2013): constant memory per group vs O(distinct) for exact —
    * the only viable distinct-count at 100 TB cardinalities. rsd 0.05 ⇒
    * ~1.6 KB of sketch per group.
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], target: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(target), rsd).as(s"approx_${target}_distinct"),
        count(lit(1)).as("n"))

  /** Approximate quantiles via QuantileSummaries (Greenwald/Khanna,
    * "Space-efficient online computation of quantile summaries",
    * SIGMOD 2001): single-pass, bounded memory, mergeable across
    * partitions.
    */
  def approxQuantiles(df: DataFrame, valueCol: String,
      probabilities: Array[Double], relativeError: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(valueCol, probabilities, relativeError)

  /** Co-located repartition: pre-shuffle both sides of a repeated join key
    * once, so subsequent joins/aggs on that key reuse the exchange
    * (Catalyst's ReuseExchange) instead of re-shuffling per query.
    */
  def colocate(df: DataFrame, key: String, numPartitions: Int): DataFrame =
    df.repartition(numPartitions, col(key))

  /** Bucketed table write: persistent co-location. Two tables bucketed on
    * the same key with the same bucket count join WITHOUT a shuffle
    * (SortMergeJoin reads bucket-aligned files directly) — the layout for
    * fact-fact joins that repeat at 100 TB, where one avoided shuffle pays
    * for the write many times over.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
