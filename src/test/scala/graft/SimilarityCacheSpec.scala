package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The IVF centroid cache must be bounded (LRU) and clearable — a
  * session-lifetime map with no eviction is a leak in a long-lived
  * service.
  */
class SimilarityCacheSpec extends AnyFunSuite {
  import SparkTest._

  test("kmeansCache is LRU-bounded and clear() empties it") {
    Similarity.clearKmeansCache()
    // one real fit populates the cache with a usable model instance
    val e = Tables.embeddings(spark, sf).limit(40)
    Similarity.ivfKnn(e.filter(col("vec_id") < 5), e, k = 2,
      nCells = 2, nProbe = 1).count()
    assert(Similarity.kmeansCacheSize == 1)
    val model = Similarity.kmeansCache.synchronized(
      Similarity.kmeansCache.values().iterator().next())

    // stuff 3x the bound through the map: size must never exceed the cap
    (1 to Similarity.KmeansCacheMax * 3).foreach { i =>
      Similarity.kmeansCache.synchronized(
        Similarity.kmeansCache.put(s"synthetic-key-$i", model))
      assert(Similarity.kmeansCacheSize <= Similarity.KmeansCacheMax)
    }
    assert(Similarity.kmeansCacheSize == Similarity.KmeansCacheMax)

    // LRU order: the most recently inserted keys survive
    val kept = Similarity.kmeansCache.synchronized {
      val it = Similarity.kmeansCache.keySet().iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(kept.contains(s"synthetic-key-${Similarity.KmeansCacheMax * 3}"))
    assert(!kept.contains("synthetic-key-1"))

    Similarity.clearKmeansCache()
    assert(Similarity.kmeansCacheSize == 0)

    // and the operator still works after a clear (refits transparently)
    val again = Similarity.ivfKnn(e.filter(col("vec_id") < 5), e, k = 2,
      nCells = 2, nProbe = 1).count()
    assert(again > 0)
    assert(Similarity.kmeansCacheSize == 1)
  }
}
