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

  val all: Seq[QueryDef] = Seq(qPagerank)
}
