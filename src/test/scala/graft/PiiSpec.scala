package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Pii

/** Typed PII detection/redaction — the contracts the graded queries
  * (`tx_pii_scan`, `tx_pii_redact`) lean on beyond oracle parity.
  */
class PiiSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("hand-built line with all four kinds redacts to the exact expected string") {
    val line = "mail a.b%c@ex-1.org or 555-123-4567, ssn 987-65-4321, ip 10.2.3.44 end"
    val got = Seq(line).toDF("text")
      .select(Pii.redactAll(col("text")).as("r")).head.getString(0)
    assert(got == "mail <EMAIL> or <PHONE>, ssn <SSN>, ip <IP> end")
  }

  test("redaction removes every match of every kind and is idempotent") {
    val docs = Tables.documents(spark, sf).select(
      concat(col("text"),
        lit(" u"), col("doc_id").cast("string"), lit("@x.io "),
        lit("555-000-1111 123-45-6789 192.168.0.1")).as("text"))
    val once = docs.select(Pii.redactAll(col("text")).as("text"))
    val residual = once.select(Pii.totalCol(col("text")).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(residual == 0L, "redacted text must scan clean for every kind")
    val twice = once.select(Pii.redactAll(col("text")).as("text"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty,
      "redaction must be idempotent")
  }

  test("per-kind counts match an independent java.util.regex census") {
    val rows = Tables.documents(spark, sf).filter(col("doc_id") < 100).select(
      concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" a@b.co 1.2.3.4")).otherwise(lit("")),
        when(col("doc_id") % 4 === 1, lit(" 555-123-4567")).otherwise(lit("")))
        .as("text"))
    val got = rows.select(
        Pii.patterns.map { case (k, _, _) => Pii.countCol(k, col("text")).as(k) }: _*)
      .agg(sum(col(Pii.patterns.head._1)).as(Pii.patterns.head._1),
        Pii.patterns.tail.map { case (k, _, _) => sum(col(k)).as(k) }: _*)
      .head
    val texts = rows.collect().map(_.getString(0))
    Pii.patterns.zipWithIndex.foreach { case ((kind, pat, _), i) =>
      val expected = texts.map(t =>
        pat.r.findAllMatchIn(t).length.toLong).sum
      assert(got.getLong(i) == expected, s"kind $kind")
    }
  }
}
