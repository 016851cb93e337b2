package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse.Ingest
import graft.functions.TextFns
import graft.sources.Sources

class IngestSpec extends AnyFunSuite {
  import SparkTest.spark
  import spark.implicits._

  test("cleanTrips: TLC-shaped projection, casts, null-drop, positive filters, cap") {
    def ts(s: String) = Timestamp.valueOf(s)
    val raw = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 10, 20, 1, 3.0, 15.0, "extra"),
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00"), 11, 21, 2, 0.0, 15.0, "x"), // dist 0 → drop
      (null.asInstanceOf[Timestamp], ts("2024-01-01 12:00:00"), 12, 22, 1, 1.0, 5.0, "y") // null → drop
    ).toDF("tpep_pickup_datetime", "tpep_dropoff_datetime", "PULocationID",
      "DOLocationID", "passenger_count", "trip_distance", "total_amount",
      "store_and_fwd_flag")
    val clean = Ingest.cleanTrips(raw)
    assert(clean.count() == 1)
    assert(clean.columns.toSeq == Seq("pickup_datetime", "dropoff_datetime",
      "pickup_zone_id", "dropoff_zone_id", "passenger_count",
      "trip_distance", "total_amount"))
    assert(clean.schema("pickup_zone_id").dataType.typeName == "long")
    // cap applies after cleaning
    val capped = Ingest.cleanTrips(raw, rowCap = Some(0))
    assert(capped.count() == 0)
  }

  test("latestMonthlyFile picks the newest month") {
    val dir = java.nio.file.Files.createTempDirectory("graft_months").toString
    Seq("2024-01", "2024-03", "2023-12").foreach { m =>
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(dir, s"yellow_tripdata_$m.parquet"))
    }
    assert(Sources.latestMonthlyFile(dir) ==
      Some(s"$dir/yellow_tripdata_2024-03.parquet"))
    assert(Sources.latestMonthlyFile(dir, prefix = "green_").isEmpty)
  }

  test("FAILFAST CSV scan aborts on malformed rows (S6 ON_ERROR semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "zones.csv"),
      "LocationID,Borough,Zone,service_zone\n1,Manhattan,Midtown,Yellow Zone\nnot_a_number,X,Y,Z\n")
    val e = intercept[Exception] {
      Sources.readZoneLookupCsv(spark, s"$dir/zones.csv").collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      e.getMessage.contains("FAILFAST"))
  }

  test("seqFingerprint is order-sensitive where bowFingerprint is not") {
    val df = Seq("a b c", "c b a").toDF("text")
      .select(TextFns.seqFingerprint(col("text")).as("seq"),
        TextFns.bowFingerprint(col("text")).as("bow"))
      .collect()
    assert(df(0).getLong(0) != df(1).getLong(0)) // order-sensitive
    assert(df(0).getString(1) == df(1).getString(1)) // order-invariant
  }
}
