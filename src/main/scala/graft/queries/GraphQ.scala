package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Graph

/** Graph analytics over the warehouse entities (training-pipeline
  * extension; no §2 counterpart — the link-analysis layer a corpus
  * pipeline uses for domain-authority weighting and co-occurrence
  * mining). Both queries are pure dataflow (operators/Graph.scala):
  * iterated joins + aggregations, no driver-side adjacency, so they
  * distribute the way the edge table partitions.
  */
object GraphQ {

  /** Shared edge CTE: nation-level trade graph — customer nation →
    * supplier nation, weighted by lineitem count. The fact scan is the
    * only big input; both nation joins broadcast.
    */
  private val tradeEdgesSql =
    """SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS DOUBLE) AS w
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |     JOIN customer c ON o.o_custkey = c.c_custkey
      |     JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |     JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |     JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |GROUP BY 1, 2""".stripMargin

  private def tradeEdges(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_name").as("src"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("dst"))),
        col("s_nationkey") === col("snk"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
  }

  /** G1: weighted PageRank on the trade graph — 3 fixed supersteps,
    * damping 0.85, rank vector rounded to 10dp each superstep (the
    * determinism contract that makes an iterative float computation
    * exactly oracle-checkable; see Graph.pageRank). The oracle unrolls
    * the same three supersteps as CTEs with the identical
    * (r * w) / ow term shape and identical per-step rounding.
    */
  val g1PageRank = QueryDef(
    "g1_pagerank",
    Some(s"""WITH e AS ($tradeEdgesSql),
            |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
            |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
            |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes),
            |r1 AS (SELECT nodes.node,
            |         round(0.15/(SELECT n FROM nn) + 0.85*coalesce(sum(r0.r*e.w/ow.ow), 0), 10) AS r
            |       FROM nodes LEFT JOIN e ON e.dst = nodes.node
            |            LEFT JOIN ow ON ow.src = e.src LEFT JOIN r0 ON r0.node = e.src
            |       GROUP BY 1),
            |r2 AS (SELECT nodes.node,
            |         round(0.15/(SELECT n FROM nn) + 0.85*coalesce(sum(r1.r*e.w/ow.ow), 0), 10) AS r
            |       FROM nodes LEFT JOIN e ON e.dst = nodes.node
            |            LEFT JOIN ow ON ow.src = e.src LEFT JOIN r1 ON r1.node = e.src
            |       GROUP BY 1),
            |r3 AS (SELECT nodes.node,
            |         round(0.15/(SELECT n FROM nn) + 0.85*coalesce(sum(r2.r*e.w/ow.ow), 0), 10) AS r
            |       FROM nodes LEFT JOIN e ON e.dst = nodes.node
            |            LEFT JOIN ow ON ow.src = e.src LEFT JOIN r2 ON r2.node = e.src
            |       GROUP BY 1)
            |SELECT node, round(r, 6) AS pagerank FROM r3""".stripMargin),
    (spark, dir) =>
      Graph.pageRank(tradeEdges(spark, dir), iterations = 3, damping = 0.85,
          iterDp = 10, cacheTag = "trade")
        .select(col("node"), round(col("r"), 6).as("pagerank")))

  /** G2: exact triangle census of the part co-purchase graph (parts
    * co-occurring in an order). Degree-ordered orientation (Schank-
    * Wagner) bounds the wedge join at |E|^1.5 — the published exact
    * algorithm for power-law graphs at scale. Output is the one-row
    * census: nodes/edges/WEDGES/triangles + global clustering
    * coefficient 3T / wedges (a ratio of exact integers, so
    * cross-engine-stable). Publishing n_wedges makes the bound
    * auditable from the result row itself.
    *
    * Measured at sf0.1 (local[32], min-of-2 warm 1.9s): |V|=20,000,
    * |E|=1,196,000, wedges=147,816,257, T=1,884,488 — raw wedges sit
    * at 0.11·|E|^1.5 (1.31e9), and the oriented edge-iterator never
    * materializes them (per-edge sorted-array intersection over
    * broadcast out-adjacency). At 100× edges the broadcast adjacency
    * (|V|·O(sqrt |E|)) is the first thing to outgrow an executor —
    * swap the hints for shuffled joins on u then v, same plan shape
    * (see Graph.triangleCount scaladoc).
    */
  val g2Triangles = QueryDef(
    "g2_triangles",
    Some("""WITH e AS (
           |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(count(*) AS BIGINT) AS w
           |  FROM lineitem a JOIN lineitem b
           |       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |  GROUP BY 1, 2),
           |d AS (SELECT p, CAST(count(*) AS BIGINT) AS deg
           |      FROM (SELECT pa AS p FROM e UNION ALL SELECT pb FROM e) GROUP BY 1),
           |o AS (SELECT CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pa ELSE pb END AS u,
           |             CASE WHEN (da.deg, pa) < (db.deg, pb) THEN pb ELSE pa END AS v
           |      FROM e JOIN d da ON da.p = pa JOIN d db ON db.p = pb),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
           |      FROM o e1 JOIN o e2 ON e1.v = e2.u
           |           JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v),
           |w AS (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM d)
           |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_nodes,
           |       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           |       w.n_wedges, t.n_triangles,
           |       round(3.0 * t.n_triangles / w.n_wedges, 4) AS clustering_coeff
           |FROM t, w""".stripMargin),
    (spark, dir) => {
      // caches are generation-bounded (ScopedCache): edges/degrees/
      // orientation are each reused 2-3× inside this one census, and are
      // |E|-sized — far smaller than the lineitem self-join that builds
      // them, so they earn a cache even at scale
      val e = graft.ScopedCache.replace("g2.edges", Graph.coOccurrenceEdges(
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey"))
      val deg = graft.ScopedCache.replace("g2.deg", Graph.degrees(e))
      val tri = Graph.triangleCount(
        graft.ScopedCache.replace("g2.oriented", Graph.orientByDegree(e, deg)))
      val census = deg.agg(
        count(lit(1)).as("n_nodes"),
        (sum(col("deg") * (col("deg") - 1)) / 2).cast("long").as("n_wedges"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      census.crossJoin(edges).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4).as("clustering_coeff"))
    })

  val all: Seq[QueryDef] = Seq(g1PageRank, g2Triangles)
}
