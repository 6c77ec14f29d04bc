package graft.operators

import graft.{QueryDef, Tables}
import graft.api.Layout
import org.apache.spark.sql.functions._

/** Physical-layout operators as oracle-gated queries (SURVEY.md §2.B).
  * The clustering effectiveness proof (z-order files bound BOTH key
  * dimensions; single-column sort bounds one) lives in `LayoutSpec`; here
  * the Morton computation itself hash-verifies bit-for-bit.
  */
object LayoutOps {

  /** Morton z-values over (l_partkey, l_suppkey): the clustering key an
    * OPTIMIZE ZORDER write sorts by. First 500 cells of the curve. */
  val qZorder: QueryDef = QueryDef.sql(
    "q_zorder",
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |       CAST(${Layout.zValue2Sql("l_partkey", "l_suppkey")} AS BIGINT) AS z
       |FROM lineitem
       |ORDER BY z, l_orderkey, l_linenumber LIMIT 500""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        Layout.zValue2(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      .limit(500)
  }

  val all: Seq[QueryDef] = Seq(qZorder)
}
