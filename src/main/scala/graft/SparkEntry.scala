package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY.md §2.B) registers here as a
  * [[QueryDef]]: a Spark implementation plus, when SQL-expressible, a
  * DuckDB oracle over the same parquet tables. The driver runs both at
  * sf0.01 and hash-compares.
  */
object SparkEntry {

  /** The full declared inventory. */
  def defs: Seq[QueryDef] =
    CodecQueries.all ++ Relational.all ++ Analytic.all ++ Temporal.all ++
      Dedup.all ++ Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++
      SqlSurface.all ++ Curation_.all ++ GraphOps.all ++ Profiling.all ++
      LayoutOps.all ++ Maintenance.all ++ Sequence.all ++ JoinAccel.all ++
      Tpch.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CodecQueries.qParseRouteDelay.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
