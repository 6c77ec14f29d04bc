package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiler: per-column null counts, exact distinct counts
  * and min/max over an arbitrary column split (numeric / string /
  * timestamp), emitted in long format — the `ANALYZE TABLE`-style summary
  * a pipeline materializes before planning joins or layout.
  *
  * Every statistic computes in ONE aggregate over ONE scan (pinned in
  * `PlanSpec`): the multi-distinct goes through Catalyst's Expand
  * (rows × #distinct-columns, still a single pass over the files, partial
  * aggregation before the one shuffle), then the single result row
  * explodes into per-column rows — driver never holds more than the
  * profile itself. At 100 TB this is the cheapest complete profile
  * possible without sketches; swap `count_distinct` for
  * `approx_count_distinct` when ±2 % is acceptable and the Expand
  * disappears entirely.
  */
object Profiler {

  /** Long-format profile: (col_name, n_rows, n_nulls, n_distinct,
    * min_num, max_num, min_str, max_str); numeric min/max rounded to 4,
    * timestamps formatted `yyyy-MM-dd HH:mm:ss`, irrelevant slots NULL. */
  def profile(df: DataFrame, numeric: Seq[String], strings: Seq[String],
      timestamps: Seq[String] = Nil): DataFrame = {
    val all = numeric ++ strings ++ timestamps
    require(all.nonEmpty, "no columns to profile")
    require(all.distinct.size == all.size, "duplicate column in profile spec")

    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        all.flatMap { c =>
          Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
            count_distinct(col(c)).as(s"${c}__distinct"))
        } ++
        numeric.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"${c}__min_n"),
          max(col(c)).cast("double").as(s"${c}__max_n"))) ++
        strings.flatMap(c => Seq(
          min(col(c)).cast("string").as(s"${c}__min_s"),
          max(col(c)).cast("string").as(s"${c}__max_s"))) ++
        timestamps.flatMap(c => Seq(
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"${c}__min_s"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"${c}__max_s")))

    val one = df.agg(aggs.head, aggs.tail: _*)

    def row(c: String, minNum: Column, maxNum: Column,
        minStr: Column, maxStr: Column): Column =
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        minNum.cast("double").as("min_num"),
        maxNum.cast("double").as("max_num"),
        minStr.cast("string").as("min_str"),
        maxStr.cast("string").as("max_str"))

    val nullC = lit(null)
    val rows =
      numeric.map(c => row(c, round(col(s"${c}__min_n"), 4),
        round(col(s"${c}__max_n"), 4), nullC, nullC)) ++
        (strings ++ timestamps).map(c =>
          row(c, nullC, nullC, col(s"${c}__min_s"), col(s"${c}__max_s")))

    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
