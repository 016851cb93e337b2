package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  import SparkTest._

  test("curation pipeline end-to-end: monotone stage counts, dedup works, output packed") {
    val docs = Tables.documents(spark, sf)
    val res = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minTokens = 20, minTtr = 0.05,
        keepLangs = Seq("en", "de", "fr", "es", "zh"), nearDupThreshold = 0.7))
    val report = res.report.orderBy("stage_no").collect()
    val counts = report.map(_.getAs[Long]("rows"))
    assert(counts.head == docs.count())
    assert(counts.sliding(2).forall { case Array(a, b) => b <= a })
    // dropped column reconciles
    report.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getAs[Long]("dropped") ==
        prev.getAs[Long]("rows") - cur.getAs[Long]("rows"))
    }

    val curated = res.curated.cache()
    val n = curated.count()
    assert(n > 0 && n == counts.last)
    // no surviving near-dup pairs above threshold among curated docs
    val residual = graft.operators.Dedup.minhashNearDups(
      curated.select(col("doc_id"), col("text")), threshold = 0.7)
    // redaction changed the text, so re-check on tokens: residual pairs must
    // not include any pair where both ids survived curation
    val survivors = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    val badPairs = residual.collect().filter(r =>
      survivors(r.getAs[Long]("id_a")) && survivors(r.getAs[Long]("id_b")))
    assert(badPairs.isEmpty, s"${badPairs.length} near-dup pairs survived")
    // packed columns present
    assert(curated.columns.toSet ==
      Set("doc_id", "lang", "source", "text", "n_tokens", "ttr", "fingerprint"))
  }

  test("quality gate actually drops short/low-diversity docs") {
    val docs = Tables.documents(spark, sf)
    val strict = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minTokens = 60, minTtr = 0.2))
    val loose = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minTokens = 1, minTtr = 0.0))
    assert(strict.curated.count() < loose.curated.count())
  }

  test("observe() piggybacks output metrics on the production write — no extra scan") {
    // the operational pattern at 100 TB: row/token accounting of the
    // curated corpus rides the SAME action that writes it (CollectMetrics
    // in-plan), instead of a second count()/agg() scan of the output
    val docs = Tables.documents(spark, sf)
    val r = CorpusPipeline.run(docs, CorpusPipeline.Config(minTokens = 20))
    val obs = org.apache.spark.sql.Observation("curated_metrics")
    r.curated
      .observe(obs, count(lit(1)).as("rows"),
        sum(col("n_tokens").cast("long")).as("tokens"))
      .write.format("noop").mode("overwrite").save()
    val rows = obs.get("rows").asInstanceOf[Long]
    val tokens = obs.get("tokens").asInstanceOf[Long]
    assert(rows == r.curated.count())
    assert(tokens == r.curated.agg(sum(col("n_tokens").cast("long")))
      .head.getLong(0))
    assert(rows > 0 && tokens > rows) // docs average > 1 token
  }
}
