package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("hashSample keeps ~frac of rows and is exactly reproducible") {
    val n = docs.count().toDouble
    val s1 = Sampling.hashSample(docs, "doc_id", 0.2)
    val k1 = s1.count().toDouble
    // md5 uniformity: 20% ± 6 percentage points on the fixture
    assert(math.abs(k1 / n - 0.2) < 0.06, s"sampled ${k1 / n}")
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("hashSample is consistent under corpus growth (no resampling)") {
    // sampling half the corpus then growing to the full corpus keeps the
    // original sample decisions — the property RNG sampling lacks
    val half = docs.filter(col("doc_id") % 2 === 0)
    val sampledHalf = Sampling.hashSample(half, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sampledFull = Sampling.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampledHalf.subsetOf(sampledFull))
    assert(sampledFull.filter(_ % 2 == 0) == sampledHalf)
  }

  test("nested fractions are monotone: frac 0.1 sample ⊆ frac 0.3 sample") {
    val s10 = Sampling.hashSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s30 = Sampling.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s30))
  }

  test("weightedInterleave applies per-arm fractions") {
    val mixed = Sampling.weightedInterleave(docs, "lang", "doc_id",
      Map("en" -> 1.0, "*" -> 0.0))
    // en at 1.0 keeps every en row; others at 0.0 keep none
    assert(mixed.filter(col("lang") =!= "en").count() == 0)
    assert(mixed.count() == docs.filter(col("lang") === "en").count())
  }

  test("withShuffleKey: deterministic, near-unique, order-randomizing") {
    val keyed = Sampling.withShuffleKey(docs, "doc_id")
    assert(keyed.select("shuffle_key").distinct().count() == docs.count())
    // ordering by the key decorrelates from doc_id order: the first 50
    // shuffled ids are not simply the 50 smallest ids
    val shuffledHead = keyed.orderBy("shuffle_key").limit(50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val smallest = docs.orderBy("doc_id").limit(50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((shuffledHead intersect smallest).size < 25)
  }
}
