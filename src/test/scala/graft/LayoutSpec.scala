package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  import SparkTest._

  test("morton key interleaves bits (known values)") {
    import spark.implicits._
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (65535, 0), (0, 65535))
      .toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    // x fills even bit positions, y odd
    assert(got(0) == 0L && got(1) == 1L && got(2) == 2L && got(3) == 3L)
    assert(got(4) == 0x55555555L && got(5) == 0xAAAAAAAAL)
  }

  test("z-order layout: box predicates touch far fewer files than linear sort") {
    val n = 200000
    // independent dimensions (hash-derived — a linear-in-id pair would
    // correlate and accidentally cluster y under the x sort)
    val grid = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1000)).cast("int").as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("int").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val files = 64
    Layout.linearWrite(grid, "x", s"$base/linear", files)
    Layout.zorderWrite(grid, "x", "y", s"$base/zorder", files)

    // a filter on the NON-sort dimension defeats linear clustering
    val yBand = col("y") >= 100 && col("y") < 150
    val linearTouched = Layout.filesTouched(spark, s"$base/linear", yBand)
    val zTouched = Layout.filesTouched(spark, s"$base/zorder", yBand)
    assert(linearTouched >= files * 3 / 4,
      s"linear layout should smear y-values across files (touched $linearTouched/$files)")
    assert(zTouched <= linearTouched / 2,
      s"z-order should localize the y-band (z=$zTouched vs linear=$linearTouched)")

    // a small 2-d box is localized even better
    val box = col("x") >= 100 && col("x") < 200 && col("y") >= 100 && col("y") < 200
    val zBox = Layout.filesTouched(spark, s"$base/zorder", box)
    assert(zBox <= files / 4,
      s"2-d box should touch a small band of z-ordered files (got $zBox/$files)")

    // layout never changes data
    assert(spark.read.parquet(s"$base/zorder").count() == n)
  }
}
