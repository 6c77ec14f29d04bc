package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANSI-SQL surface a reference user would expect beyond the DataFrame
  * operators: correlated subqueries (decorrelated by Catalyst into joins,
  * never per-row re-scans), RANGE window frames, and recursive CTEs
  * (Spark 4 `WITH RECURSIVE` — iterative distributed fixpoint, the SQL
  * face of the `connectedComponents` loop pattern). Each runs the SAME
  * query text shape on both engines, so these also pin dialect parity.
  *
  * Scale notes: the correlated scalar subquery and EXISTS/NOT EXISTS
  * plan as broadcast/shuffle hash joins after decorrelation (`PlanSpec`
  * pins no nested-loop); the RANGE frame is one window pass over a
  * pre-aggregated frame (never the raw fact table); the recursive CTE
  * materializes one level per iteration — rows per level are bounded by
  * the hierarchy's fan-out, and each step is an equi-join on the parent
  * key, exactly the shape a 100 TB BOM/org traversal needs.
  */
object SqlSurface {

  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(sql)
  }

  /** Correlated scalar subquery (per-nation exact-decimal mean) + EXISTS +
    * NOT EXISTS, all in one predicate — Catalyst decorrelates the scalar
    * into an aggregate-join and the (anti)semijoins into hash joins. */
  val qSubqueryCorrelated: QueryDef = QueryDef.sql(
    "q_subquery_correlated",
    """SELECT c.c_custkey, c.c_name, c.c_acctbal AS bal
      |FROM customer c
      |WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
      |                     FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
      |                    AND o2.o_totalprice > 400000)
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    withViews(s, d)(
      """SELECT c.c_custkey, c.c_name, c.c_acctbal AS bal
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |                     FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
        |                    AND o2.o_totalprice > 400000)
        |ORDER BY c.c_custkey""".stripMargin)
  }

  /** Value-based RANGE frame (trailing 30-day order count per customer)
    * over integer day numbers — RANGE, not ROWS: days with no orders
    * still age out of the frame. One window pass over the per-(customer,
    * day) pre-aggregate. */
  val qWindowRange: QueryDef = QueryDef.sql(
    "q_window_range",
    """SELECT o_custkey, dnum, n_day,
      |       CAST(sum(n_day) OVER (PARTITION BY o_custkey ORDER BY dnum
      |            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
      |FROM (SELECT o_custkey,
      |             CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS dnum,
      |             CAST(count(*) AS BIGINT) AS n_day
      |      FROM orders GROUP BY 1, 2)
      |ORDER BY o_custkey, dnum""".stripMargin) { (s, d) =>
    withViews(s, d)(
      """SELECT o_custkey, dnum, n_day,
        |       sum(n_day) OVER (PARTITION BY o_custkey ORDER BY dnum
        |            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
        |FROM (SELECT o_custkey,
        |             datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS dnum,
        |             count(*) AS n_day
        |      FROM orders GROUP BY 1, 2)
        |ORDER BY o_custkey, dnum""".stripMargin)
  }

  /** Recursive CTE: level-wise traversal of the binary-heap hierarchy
    * `parent(k) = floor(k / 2)` rooted at customer 0, rolling integer-cent
    * balances up per depth — the BOM/org-chart pattern. Each recursion
    * step is one distributed equi-join of the frontier against the
    * dimension (frontier rows only, never the whole table re-derived).
    *
    * Determinism hardening (round 8): the query text is CHARACTER-IDENTICAL
    * on both engines — `floor(k / 2)` instead of Spark `div` / DuckDB `//`
    * (float division then floor is exact for keys far below 2^53) — and
    * every output column is an explicitly-cast BIGINT (money as cents), so
    * no decimal-scale or integer-division semantics can diverge across
    * DuckDB versions. Round 7's formulation hash-failed only on the
    * driver's DuckDB while passing locally on 1.0.0. */
  private val recursiveCteText: String =
    """WITH RECURSIVE h(k, depth) AS (
      |  SELECT CAST(c_custkey AS BIGINT), CAST(0 AS BIGINT) FROM customer WHERE c_custkey = 0
      |  UNION ALL
      |  SELECT CAST(c.c_custkey AS BIGINT), h.depth + 1
      |  FROM customer c JOIN h ON CAST(floor(c.c_custkey / 2) AS BIGINT) = h.k AND c.c_custkey <> h.k
      |)
      |SELECT CAST(depth AS BIGINT) AS depth,
      |       CAST(count(*) AS BIGINT) AS n_nodes,
      |       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      |FROM h JOIN customer c ON c.c_custkey = h.k
      |GROUP BY depth
      |ORDER BY depth""".stripMargin

  val qRecursiveCte: QueryDef = QueryDef.sql(
    "q_recursive_cte", recursiveCteText) { (s, d) =>
    withViews(s, d)(recursiveCteText)
  }

  /** LATERAL correlated subquery (top-2 orders per customer): the SQL
    * surface's per-row dependent subquery, distinct from the aggregate
    * formulation of `q_grouped_topk` — Catalyst decorrelates the lateral
    * into a ranked join (DomainJoin rewrite), never a per-customer rescan
    * of orders: the measured plan is WindowGroupLimit (partial BEFORE the
    * exchange, so ≤2 rows per customer ever shuffle) + one broadcast hash
    * join. DuckDB runs the same text natively. Deterministic via the
    * (o_totalprice DESC, o_orderkey) tie-break. */
  val qLateralTopn: QueryDef = QueryDef.sql(
    "q_lateral_topn", {
      val q =
        """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey, o_totalprice
          |  FROM orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
          |  ORDER BY o_totalprice DESC, o_orderkey
          |  LIMIT 2) t
          |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin
      q
    }) { (s, d) =>
    withViews(s, d)(
      """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(
    qSubqueryCorrelated, qWindowRange, qRecursiveCte, qLateralTopn)
}
