package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse._

class RunnerSpec extends AnyFunSuite {
  import SparkTest.spark

  test("reference pipeline runs end-to-end with quality gates green") {
    val martDir = java.nio.file.Files.createTempDirectory("graft_marts").toString
    val inputs = Map(
      "raw_trips" -> TaxiFixtures.rawTrips,
      "raw_weather" -> TaxiFixtures.rawWeather,
      "zones" -> TaxiFixtures.zones)
    val (built, results) = Runner.run(inputs, Runner.referencePipeline(martDir))
    assert(results.map(_.name) ==
      Seq("stg_taxi_trips", "stg_weather", "int_trips_enriched",
        "int_weather_hourly", "mart_trips_weather", "mart_daily_metrics",
        "mart_zone_analysis", "zone_demand"))
    assert(results.forall(_.gateFailures.isEmpty))
    // marts materialized and re-readable
    assert(built("mart_daily_metrics").count() > 0)
    assert(spark.read.parquet(s"$martDir/mart_daily_metrics").count() ==
      built("mart_daily_metrics").count())

    // lineage docs (dbt docs generate analog) reflect the executed DAG
    val stages = Runner.referencePipeline(martDir)
    val doc = Runner.lineageDoc(stages, built)
    assert(doc.contains("int_trips_enriched --> mart_trips_weather"))
    assert(doc.contains("## mart_daily_metrics"))
    assert(doc.contains("materialized: table"))
    assert(doc.contains("| trip_date |"))
    val manifest = Runner.lineageManifest(stages, built)
    // parses as JSON and carries deps + schemas + source nodes
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(manifest)
    assert(root.get("raw_trips").get("resource_type").asText == "source")
    assert(root.get("mart_trips_weather").get("materialized").asText == "table")
    assert(root.get("mart_trips_weather").get("depends_on").toString
      .contains("int_weather_hourly"))
    assert(root.get("stg_taxi_trips").get("columns").has("pickup_datetime"))
  }

  test("a failing quality gate aborts the run with a named violation") {
    import spark.implicits._
    val bad = Seq((1, "x"), (1, "y")).toDF("id", "v")
    val stages = Seq(Runner.Stage("dup", Seq("in"),
      m => m("in"), None, Seq(Runner.uniqueGate("id"))))
    val e = intercept[IllegalArgumentException] {
      Runner.run(Map("in" -> bad), stages)
    }
    assert(e.getMessage.contains("unique(id)"))
  }

  test("post-run maintenance gate compacts a threshold-crossing index; next sink batch honors it") {
    import graft.streaming.EventsStreaming
    import spark.implicits._
    // a gram index accreted by the streaming sink (one-plus files per
    // micro-batch) crosses the policy threshold; the PIPELINE run is
    // what compacts it — and the next sink batch must land inside the
    // new hb= layout with unchanged flags
    import DupFlagKit.{docsDf, tokenRows}
    val parts = Seq(
      docsDf(spark, tokenRows("a", 0 until 6, tokens = 12)),
      docsDf(spark, tokenRows("b", 100 until 106, tokens = 12)),
      docsDf(spark, tokenRows("a", 0 until 3, tokens = 12)
        .map { case (i, t) => (200L + i, t) }))
    val base = java.nio.file.Files.createTempDirectory("graft_runner_maint")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def runSink(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(base, parts.take(2)); runSink()
    assert(Maintenance.totalDataFiles(spark, idxPath) > 1, "accreted flat files")

    val stages = Seq(Runner.Stage("audit", Seq("docs"),
      m => m("docs").groupBy("source").count()))
    val (_, results) = Runner.run(Map("docs" -> parts.head), stages,
      maintenance = Seq(
        Maintenance.MaintenanceTarget(idxPath, Maintenance.TableKind.GramIndex,
          maxDataFiles = 1, buckets = 4),
        // under threshold ⇒ untouched (no gratuitous rewrites)
        Maintenance.MaintenanceTarget(outPath, Maintenance.TableKind.DocTable,
          maxDataFiles = 10000)))
    assert(results.map(_.name) == Seq("audit", s"maintenance:$idxPath"),
      "only the threshold-crossing target may appear as an action")
    assert(Maintenance.gramIndexBuckets(spark, idxPath).contains(4))
    assert(!new java.io.File(outPath, "_graft_buckets").exists())

    // the next sink batch honors the compacted layout and flags exactly
    DupFlagKit.stageArrival(base, parts.drop(2), startK = 2); runSink()
    assert(!new java.io.File(idxPath).listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "post-compaction appends must land inside hb= buckets")
    val (expected, _) = DupFlagKit.dupFlagReference(parts)
    assert(DupFlagKit.readFlags(spark, outPath) == expected)
  }

  test("unresolvable dependencies are reported, not silently dropped") {
    val stages = Seq(Runner.Stage("orphan", Seq("missing"), m => m("missing")))
    val e = intercept[IllegalArgumentException] {
      Runner.run(Map.empty, stages)
    }
    assert(e.getMessage.contains("orphan"))
  }
}
