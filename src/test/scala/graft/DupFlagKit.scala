package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Shared machinery for the streaming dup-flagging specs
  * (StreamingSpec, MaintenanceSpec): staged multi-file arrivals with
  * deterministic order, and the plain-Scala reference replay of the
  * asymmetric contract. One definition so both suites pin the SAME
  * arrival convention and reference semantics.
  */
object DupFlagKit {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** One synthetic doc text: `tokens` namespaced distinct tokens —
    * reuse the same (prefix, i) to make verbatim copies, vary it for
    * novel docs. THE one definition (was copy-pasted per test).
    */
  def tokenText(prefix: String, i: Int, tokens: Int = 30): String =
    (0 until tokens).map(j => s"$prefix${i}_$j").mkString(" ")

  /** (doc_id, text) rows of novel synthetic docs. */
  def tokenRows(prefix: String, ids: Range, tokens: Int = 30): Seq[(Long, String)] =
    ids.map(i => (i.toLong, tokenText(prefix, i, tokens)))

  /** A documents-schema frame from (doc_id, text) rows. */
  def docsDf(spark: SparkSession, rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Stage each part as one parquet file in `<base>/in`, mtimes in part
    * order (arrival order = file mtime order for maxFilesPerTrigger=1).
    * Callable repeatedly with increasing `startK` to land parts
    * mid-test.
    */
  def stageArrival(base: java.nio.file.Path, parts: Seq[DataFrame],
      startK: Int = 0): String = {
    val srcDir = base.resolve("in")
    java.nio.file.Files.createDirectories(srcDir)
    parts.zipWithIndex.foreach { case (p, i) =>
      val k = startK + i
      val tmp = base.resolve(s"tmp$k").toString
      p.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = srcDir.resolve(s"batch$k.parquet")
      java.nio.file.Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + k * 60000L)
    }
    srcDir.toString
  }

  def docStream(spark: SparkSession, srcDir: String): DataFrame =
    spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)

  def windows8(text: String): Seq[String] = {
    val w = text.split(" ", -1)
    if (w.length < 8) Nil
    else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" "))
  }

  /** Plain Scala replay of the asymmetric span-dup contract: per-doc
    * (n_windows, n_dup_vs_landed) plus the landed distinct-gram set.
    */
  def dupFlagReference(parts: Seq[DataFrame])
      : (Map[Long, (Long, Long)], Set[String]) = {
    var landed = Set.empty[String]
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    parts.foreach { p =>
      val rows = p.select("doc_id", "text").collect()
      rows.foreach { r =>
        val ws = windows8(r.getString(1))
        expected(r.getLong(0)) = (ws.size.toLong, ws.count(landed.contains).toLong)
      }
      landed ++= rows.flatMap(r => windows8(r.getString(1)))
    }
    (expected.toMap, landed)
  }

  /** The documents fixture cut into three ordered arrival parts. */
  def fixtureParts(spark: SparkSession, sf: String): Seq[DataFrame] = {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    Seq(
      docs.filter(col("doc_id") < 150),
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
      docs.filter(col("doc_id") >= 300))
  }

  /** Read the flagged output and compare against the reference map. */
  def readFlags(spark: SparkSession, outPath: String): Map[Long, (Long, Long)] =
    spark.read.parquet(outPath)
      .select("doc_id", "n_windows", "n_dup_vs_landed").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Plain Scala replay of the asymmetric NEAR-dup contract (exact
    * 3-shingle jaccard vs strictly-earlier batches): per-doc
    * (n_near_dups, dup_of).
    */
  // THE shingle/jaccard pair both near-dup references share — match the
  // engine exactly: full-width shingles only, so a doc below 3 tokens has
  // the EMPTY set (sliding(3) alone would emit one truncated group and
  // flag identical short docs the engine keeps)
  private def sh(t: String): Set[String] = {
    val w = t.split(" ", -1)
    if (w.length < 3) Set.empty[String]
    else w.sliding(3).map(_.mkString(" ")).toSet
  }
  private def jac(a: Set[String], b: Set[String]): Double = {
    val i = (a & b).size.toDouble
    val u = a.size + b.size - i
    if (u == 0) 0.0 else i / u
  }

  def nearDupReference(parts: Seq[DataFrame],
      threshold: Double = 0.7): Map[Long, (Long, Option[Long])] = {
    var landed = Vector.empty[(Long, Set[String])]
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Option[Long])]
    parts.foreach { p =>
      val rows = p.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), sh(r.getString(1))))
      rows.foreach { case (id, s) =>
        val m = landed.filter { case (_, ls) => jac(s, ls) >= threshold }.map(_._1)
        expected(id) = (m.size.toLong, m.minOption)
      }
      landed ++= rows
    }
    expected.toMap
  }

  /** Greedy kept-set replay of the streaming near-dup DEDUP contract
    * (`nearDupDedupedAppend`): landed = kept docs only, so a doc is
    * dropped iff it matches a KEPT doc from an EARLIER batch (within-
    * batch pairs out of scope, one-hop similarity only — a doc similar
    * only to a dropped doc is kept). Returns the kept ids.
    */
  def nearDupDedupReference(parts: Seq[DataFrame],
      threshold: Double = 0.7): Set[Long] = {
    var kept = Vector.empty[(Long, Set[String])]
    parts.foreach { p =>
      val rows = p.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), sh(r.getString(1))))
      val keptBefore = kept
      rows.foreach { case (id, s) =>
        if (!keptBefore.exists { case (_, ks) => jac(s, ks) >= threshold })
          kept :+= ((id, s))
      }
    }
    kept.map(_._1).toSet
  }

  /** Read the near-dup flagged output: doc_id -> (n, dup_of, verdict). */
  def readNearDupFlags(spark: SparkSession, outPath: String)
      : Map[Long, (Long, Option[Long], String)] =
    spark.read.parquet(outPath)
      .select("doc_id", "n_near_dups", "dup_of", "verdict").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
      .toMap
}
