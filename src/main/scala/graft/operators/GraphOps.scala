package graft.operators

import graft.{QueryDef, Tables}
import graft.api.Graph
import org.apache.spark.sql.functions._

/** Iterative graph analytics as oracle-gated queries (SURVEY.md §2.B).
  *
  * The graph derives from the star schema itself: an undirected
  * customer–supplier relation ("customer bought from supplier"), i.e. the
  * distinct (o_custkey, l_suppkey) pairs of `orders ⋈ lineitem`,
  * symmetrized. Supplier ids live at +1,000,000 to share one node space.
  *
  * PageRank runs in integer micro-units ([[graft.api.Graph.pageRankInt]])
  * so five iterations replay bit-for-bit in the DuckDB oracle — the
  * recursive structure unrolls into five chained CTEs (SQL aggregation
  * isn't allowed inside a recursive member, so the unroll IS the portable
  * formulation at fixed depth).
  */
object GraphOps {

  private val SupplierBase = 1000000L

  private def rankCte(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node, CAST(150000 + (850000 * COALESCE(s.c, 0)) // 1000000 AS BIGINT) AS r
       |  FROM n LEFT JOIN (
       |    SELECT e.dst AS node, sum(p.r // deg.d) AS c
       |    FROM $prev p JOIN e ON p.node = e.src JOIN deg ON deg.src = p.node
       |    GROUP BY e.dst) s USING (node))""".stripMargin

  /** 5-iteration integer PageRank over the customer–supplier graph,
    * top 100 nodes. Suppliers (hubs touching many customers) surface at
    * the top — the shape a real influence ranking shows. */
  val qPagerank: QueryDef = QueryDef.sql(
    "q_pagerank", {
      val ctes = (0 until 5).map(i => rankCte(s"r$i", s"r${i + 1}")).mkString(",\n")
      s"""WITH base AS (
         |  SELECT DISTINCT o_custkey AS c, $SupplierBase + l_suppkey AS s
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |),
         |e AS (SELECT c AS src, s AS dst FROM base UNION ALL SELECT s, c FROM base),
         |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
         |$ctes
         |SELECT CASE WHEN node >= $SupplierBase THEN 'supplier' ELSE 'customer' END AS node_type,
         |       CASE WHEN node >= $SupplierBase THEN node - $SupplierBase ELSE node END AS node_id,
         |       r AS rank
         |FROM r5 ORDER BY rank DESC, node_type, node_id LIMIT 100""".stripMargin
    }) { (s, d) =>
    val base = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (lit(SupplierBase) + col("l_suppkey")).as("s"))
      .distinct()
    val edges = base.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(base.select(col("s").as("src"), col("c").as("dst")))
    Graph.pageRankInt(edges, iters = 5)
      .select(
        when(col("node") >= SupplierBase, "supplier").otherwise("customer")
          .as("node_type"),
        when(col("node") >= SupplierBase, col("node") - SupplierBase)
          .otherwise(col("node")).as("node_id"),
        col("rank"))
      .orderBy(col("rank").desc, col("node_type"), col("node_id"))
      .limit(100)
  }

  /** Per-part triangle participation in the co-purchase graph (parts
    * appearing in the same order are connected), top 100. Runs the
    * degree-oriented forward algorithm ([[graft.api.Graph.triangleNodeCounts]])
    * whose wedge volume is bounded by orientation — the naive
    * `u < v < w` triple self-join it replaces is quadratic in hub degree.
    * The oracle replays the same orientation relationally; counts are
    * exact integers, so the hash match is bit-for-bit.
    */
  val qTriangles: QueryDef = QueryDef.sql(
    "q_triangles",
    """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |bigord AS (
      |  SELECT l_orderkey FROM li0 GROUP BY l_orderkey HAVING count(*) > 100
      |),
      |li AS (
      |  SELECT * FROM li0 WHERE l_orderkey NOT IN (SELECT l_orderkey FROM bigord)
      |),
      |e0 AS (
      |  SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
      |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |),
      |deg AS (
      |  SELECT node, count(*) AS d
      |  FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
      |  GROUP BY node
      |),
      |a AS (
      |  SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.u ELSE e0.v END AS src,
      |         CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.v ELSE e0.u END AS dst
      |  FROM e0 JOIN deg du ON du.node = e0.u JOIN deg dv ON dv.node = e0.v
      |),
      |tri AS (
      |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |  FROM a e1
      |  JOIN a e2 ON e1.src = e2.src AND e1.dst <> e2.dst
      |  JOIN a e3 ON e3.src = e1.dst AND e3.dst = e2.dst
      |)
      |SELECT node AS part_id, count(*) AS tri_cnt
      |FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
      |GROUP BY node
      |ORDER BY tri_cnt DESC, part_id
      |LIMIT 100""".stripMargin) { (s, d) =>
    // Edge derivation via per-order sorted part-SETS, not a lineitem
    // self-join: collect_set dedups map-side inside one groupBy, and the
    // (u < v) pairs explode from array slices WITHOUT any join — so the
    // only exchanges are the orderkey groupBy and the final pair
    // distinct (measured: 228 MB shuffle → ~90 MB at sf0.1). The size
    // guard is the BucketCap semantics inline: pair generation is
    // quadratic PER ORDER, so orders with > 100 distinct parts are
    // excluded (a no-op on TPC-H-shaped data, mirrored in the oracle).
    val grouped = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")).between(2, 100))
    val und = grouped
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "u")))
      .select(col("u"),
        explode(slice(col("ps"), col("i") + 2, size(col("ps")))).as("v"))
      .distinct()
    Graph.triangleNodeCounts(und)
      .select(col("node").as("part_id"), col("tri_cnt"))
      .orderBy(col("tri_cnt").desc, col("part_id"))
      .limit(100)
  }

  val all: Seq[QueryDef] = Seq(qPagerank, qTriangles)
}
