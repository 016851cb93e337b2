package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse.Maintenance

class MaintenanceSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("compact rewrites only oversized partitions; data is identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // partition A: 12 tiny appends (streaming accretion); partition B: 1 file
    (1 to 12).foreach { i =>
      Seq((i.toLong, "2024-01-01")).toDF("v", "d")
        .select(col("v"), col("d").cast("date").as("p_date"))
        .write.mode("append").partitionBy("p_date").parquet(dir)
    }
    Seq((100L, "2024-01-02")).toDF("v", "d")
      .select(col("v"), col("d").cast("date").as("p_date"))
      .write.mode("append").partitionBy("p_date").parquet(dir)

    val before = spark.read.parquet(dir).orderBy("v").collect().map(_.toString)
    val countsBefore = Maintenance.dataFileCounts(spark, dir)
    assert(countsBefore("p_date=2024-01-01") == 12)
    assert(countsBefore("p_date=2024-01-02") == 1)

    val compacted = Maintenance.compact(spark, dir, maxFilesPerPartition = 4)
    assert(compacted == Seq("p_date=2024-01-01"), "only the oversized partition")

    val countsAfter = Maintenance.dataFileCounts(spark, dir)
    assert(countsAfter("p_date=2024-01-01") <= 4,
      s"expected few files, got ${countsAfter("p_date=2024-01-01")}")
    assert(countsAfter("p_date=2024-01-02") == 1, "untouched partition kept as-is")
    val after = spark.read.parquet(dir).orderBy("v").collect().map(_.toString)
    assert(after.sameElements(before), "compaction must not change data")
  }

  test("evolveAppend: null-fills missing columns, rejects/admits new ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a", 1.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    // batch missing `score` → null-filled, append succeeds
    Maintenance.evolveAppend(spark,
      Seq((2L, "b")).toDF("id", "name"), dir)
    val rows = spark.read.parquet(dir).orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(rows(1).fieldIndex("score")))

    // batch with an undeclared column → rejected by default
    intercept[IllegalArgumentException] {
      Maintenance.evolveAppend(spark,
        Seq((3L, "c", 2.0, "extra")).toDF("id", "name", "score", "tag"), dir)
    }
    // ... admitted when widening is allowed; mergeSchema read sees it
    Maintenance.evolveAppend(spark,
      Seq((3L, "c", 2.0, "t3")).toDF("id", "name", "score", "tag"), dir,
      allowNewColumns = true)
    val widened = Maintenance.readEvolved(spark, dir).orderBy("id").collect()
    assert(widened.length == 3)
    assert(widened(2).getAs[String]("tag") == "t3")
    assert(widened(0).isNullAt(widened(0).fieldIndex("tag")))
    // numeric batch column cast to the table's type on the common columns
    assert(spark.read.parquet(dir).schema("score").dataType.typeName == "double")
  }
}
