package graft.operators

import graft.{QueryDef, Tables}
import graft.api.Profiler
import org.apache.spark.sql.functions._

/** Table profiling as an oracle-gated query (SURVEY.md §2.B): the
  * `ANALYZE TABLE`-style summary computed in one aggregate over one scan
  * ([[graft.api.Profiler]]).
  */
object Profiling {

  /** Single-pass profile of six heterogeneous lineitem columns. */
  val qProfile: QueryDef = QueryDef.sql(
    "q_profile",
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    count(CASE WHEN l_quantity IS NULL THEN 1 END) AS c1n, count(DISTINCT l_quantity) AS c1d, min(l_quantity) AS c1min, max(l_quantity) AS c1max,
      |    count(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS c2n, count(DISTINCT l_extendedprice) AS c2d, min(l_extendedprice) AS c2min, max(l_extendedprice) AS c2max,
      |    count(CASE WHEN l_discount IS NULL THEN 1 END) AS c3n, count(DISTINCT l_discount) AS c3d, min(l_discount) AS c3min, max(l_discount) AS c3max,
      |    count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS c4n, count(DISTINCT l_returnflag) AS c4d, min(l_returnflag) AS c4min, max(l_returnflag) AS c4max,
      |    count(CASE WHEN l_linestatus IS NULL THEN 1 END) AS c5n, count(DISTINCT l_linestatus) AS c5d, min(l_linestatus) AS c5min, max(l_linestatus) AS c5max,
      |    count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS c6n, count(DISTINCT l_shipdate) AS c6d,
      |    strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS c6min, strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS c6max
      |  FROM lineitem
      |)
      |SELECT 'l_quantity' AS col_name, n AS n_rows, c1n AS n_nulls, c1d AS n_distinct, round(c1min, 4) AS min_num, round(c1max, 4) AS max_num, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
      |UNION ALL SELECT 'l_extendedprice', n, c2n, c2d, round(c2min, 4), round(c2max, 4), NULL, NULL FROM a
      |UNION ALL SELECT 'l_discount', n, c3n, c3d, round(c3min, 4), round(c3max, 4), NULL, NULL FROM a
      |UNION ALL SELECT 'l_returnflag', n, c4n, c4d, NULL, NULL, c4min, c4max FROM a
      |UNION ALL SELECT 'l_linestatus', n, c5n, c5d, NULL, NULL, c5min, c5max FROM a
      |UNION ALL SELECT 'l_shipdate', n, c6n, c6d, NULL, NULL, c6min, c6max FROM a
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    Profiler.profile(Tables.lineitem(s, d),
        numeric = Seq("l_quantity", "l_extendedprice", "l_discount"),
        strings = Seq("l_returnflag", "l_linestatus"),
        timestamps = Seq("l_shipdate"))
      .orderBy("col_name")
  }

  val all: Seq[QueryDef] = Seq(qProfile)
}
