package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Design notes for scale (100 TB target):
  *   - Reads are plain `spark.read.parquet` — schema comes from parquet
  *     footers, so column pruning and predicate pushdown reach the scan
  *     (verify via `.explain`: `ReadSchema` / `PushedFilters`).
  *   - At warehouse scale the fact tables (lineitem/orders/events) would be
  *     written partitioned by date (see `Warehouse.writePartitioned`); the
  *     fixture files are single parquet files, which Spark still splits into
  *     row-group-aligned input partitions (`spark.sql.files.maxPartitionBytes`).
  *   - Dimension tables (region/nation/supplier/part/customer) are small by
  *     construction (TPC-H star schema) — always broadcast them in joins.
  *
  * Mirrors the reference's source layer: parquet scan at
  * dags/etl_spark_historical.py:178, CSV dimension at dags/zone_forecast.py:47.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables that should always be on the broadcast side of a join. */
  val dims: Set[String] = Set("region", "nation", "customer", "supplier", "part")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet has shipped with two physical encodings of `ts` over
    * time: TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts
    * as a raw long under the legacy conf) and plain `timestamp[us]` (which
    * Spark 4 reads as TIMESTAMP_NTZ). Schema-on-read: dispatch on the
    * footer dtype instead of assuming one encoding — the reference takes
    * the same stance for the TLC parquet (schema-on-read at
    * dags/etl_spark_historical.py:178 with explicit casts at :185-189).
    * Any new encoding fails loudly here rather than corrupting event time
    * downstream (at 100 TB a silent unit error is a state explosion in
    * every interval join, not just a wrong answer).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }

  /** Normalize `ts` to TimestampType regardless of physical encoding.
    * Integer `div` for the nanos→µs path avoids the double-precision
    * overflow a `/ 1000` would hit on epoch-nanos; the NTZ cast is
    * wall-clock-preserving under the session's fixed UTC timezone.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — extend " +
          "Tables.normalizeEventTs for the new fixture encoding")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every fixture table as a temp view (handy for spark.sql
    * paths). `events` goes through the nanos-safe reader so SQL-text
    * queries see a proper TimestampType `ts`.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}

/** Session factory with the scale-aware defaults every entrypoint shares. */
object GraftSession {
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
