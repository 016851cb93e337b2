package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Lloyd's k-means as pure relational algebra over the long-form
  * (vec_id, pos, x) layout — every step is a join + aggregation, so the
  * algorithm distributes exactly like any other query: points stay
  * partitioned, centroids are the only state that moves between
  * supersteps (k·dim rows — broadcast-sized until k reaches tens of
  * thousands, shuffle-joined on pos beyond that).
  *
  * Determinism contract (same discipline as Graph.pageRank):
  *   - seeding is the hash-order top-k (Sampling.hexVal), not RNG;
  *   - per-point distances are rounded to 6dp with a cluster-id
  *     tiebreak before the argmin;
  *   - centroid coordinates are rounded to 6dp each update;
  * so every superstep's input is bit-identical on any engine or
  * partitioning, and the whole fit is exactly oracle-checkable — the
  * property MLlib's KMeans (RNG seeds, float merge order) can't offer.
  * The fixture check pins assignments cross-engine at 64 dims, k=8.
  */
object KMeans {

  /** Long-form explode: (idCol, vecCol: array<float>) → (vec_id, pos, x)
    * with 1-based pos (matches SQL subscripting) and double x.
    */
  def explodePoints(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"), posexplode(col(vecCol)).as(Seq("p0", "xf")))
      .select(col("vec_id"), (col("p0") + 1).as("pos"), col("xf").cast("double").as("x"))

  /** Hash-order seeds: the k points with the smallest (hexVal, vec_id)
    * key become clusters 0..k-1 in that order. TakeOrderedAndProject —
    * no full sort, no RNG.
    */
  def hashSeeds(df: DataFrame, idCol: String, k: Int): DataFrame = {
    // the window ranks the ALREADY-LIMITED k rows — k-bounded frame
    val w = Window.orderBy(col("hk"), col("vec_id"))
    df.select(col(idCol).as("vec_id"), Sampling.hexVal(col(idCol)).as("hk"))
      .orderBy(col("hk"), col("vec_id")).limit(k)
      .select(col("vec_id"), (row_number().over(w) - 1).cast("long").as("cluster"))
  }

  private def assign(pts: DataFrame, centroids: DataFrame): DataFrame = {
    val d = pts.join(broadcast(centroids), "pos")
      .groupBy(col("vec_id"), col("cluster"))
      .agg(round(sum((col("x") - col("v")) * (col("x") - col("v"))), 6).as("d"))
    // argmin as min(struct(d, cluster)) — struct ordering IS the
    // (d, cluster) tiebreak the row_number window used, but as a
    // DeclarativeAggregate it partial-aggregates map-side (k candidate
    // rows per point collapse before the exchange) and needs no per-
    // point sort; the window form shuffled all k rows and sorted them
    // just to keep rank 1 (guide §2.3: aggregate before you shuffle)
    d.groupBy(col("vec_id"))
      .agg(min(struct(col("d"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"),
        col("m.d").as("d"))
  }

  private def update(pts: DataFrame, asg: DataFrame): DataFrame =
    asg.join(pts, "vec_id")
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("x")), 6).as("v"))

  /** Fit + final assignment: `iters` update rounds after the seed
    * assignment, returning (vec_id, cluster, d) — d the 6dp-rounded
    * squared distance to the winning centroid. An empty cluster simply
    * vanishes from the centroid table (no respawn heuristic — the
    * deterministic contract matters more than cluster-count vanity).
    */
  def lloyd(points: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1; got k=$k iters=$iters")
    // generation-bounded cache: the long-form points are re-scanned by
    // every assign/update superstep (graft.ScopedCache keeps one live copy)
    val pts = graft.ScopedCache.replace("kmeans.pts",
      explodePoints(points, idCol, vecCol))
    val seeds = hashSeeds(points, idCol, k)
    var centroids = seeds.join(pts, "vec_id")
      .select(col("cluster"), col("pos"), col("x").as("v"))
    var asg: DataFrame = null
    // The centroid lineage stays LAZY on purpose (measured this round):
    // iteration i's broadcast subtree textually contains iteration
    // i-1's, but ReuseExchange dedupes the canonically-identical
    // broadcast exchanges, so the single final action computes each
    // superstep once — materializing per superstep (checkpoint or a
    // k·dim collect) added a job round-trip per iteration and ran
    // 1.4-1.5× SLOWER at bench scale for zero recompute saved.
    for (_ <- 1 to iters) {
      asg = assign(pts, centroids)
      centroids = update(pts, asg)
    }
    assign(pts, centroids)
  }
}
