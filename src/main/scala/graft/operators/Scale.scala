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

  /** Bloom-filter-pruned semi join — the explicit form of Spark's own
    * runtime row-level filtering (InjectRuntimeFilter): build a Bloom
    * filter over the (small, filtered) dim keys, push `might_contain`
    * into the fact scan as a cheap codegen'd predicate, then close with
    * the exact LEFT SEMI join. The result is EXACTLY the plain semi
    * join — the Bloom pass has no false negatives and the exact join
    * removes its false positives — but at 100 TB the fact rows that
    * reach the semi-join shuffle drop by ~the dim selectivity (fpp
    * overhead aside), which is the difference between shuffling the
    * full fact table and shuffling the matching slice.
    *
    * The filter rides to executors as a binary literal inside the
    * predicate (same transport as a broadcast var, one deserialize per
    * task). `expectedItems` is a capacity bound, not a count — at scale
    * you'd size it from stats; an undersized filter only raises fpp
    * (more rows for the exact join to reject), never wrongness.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1L << 16,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    val keys = dim.select(col(dimKey).cast("long").as("__k"))
    // stat.bloomFilter NPEs on a zero-row build side (null agg buffer);
    // an empty dim means an empty semi join — short-circuit it
    if (keys.isEmpty) return fact.filter(lit(false))
    val bf = keys.stat.bloomFilter("__k", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ColumnBridge.expression(col(factKey).cast("long"))))
    fact.filter(col(factKey).isNotNull && mightContain)
      .join(keys.distinct(), col(factKey).cast("long") === col("__k"), "left_semi")
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
