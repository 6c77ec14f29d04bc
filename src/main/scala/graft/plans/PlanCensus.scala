package graft.plans

import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** THE physical-plan node census — the single definition consumed by
  * `PlanBudgetSpec` (freezes every query's shape against
  * `plan_budgets.txt`) and `TpchScaleBench` (diffs shapes at 10× data
  * against the same budgets). One definition means the spec's verdict and
  * the scale bench's diff can never disagree about what was counted.
  * `ReusedExchangeExec` is deliberately NOT matched: counts reflect
  * exchanges that do work, not plan references to one. */
object PlanCensus {

  val keys: Seq[String] = Seq("scan", "shuffle", "broadcast", "smj", "bhj",
    "shj", "bnlj", "cartesian", "sort", "window", "expand")

  def shape(plan: SparkPlan): Map[String, Int] = {
    val m = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    plan.foreach {
      case _: ShuffleExchangeLike => m("shuffle") += 1
      case _: BroadcastExchangeLike => m("broadcast") += 1
      case _: FileSourceScanExec => m("scan") += 1
      case _: SortMergeJoinExec => m("smj") += 1
      case _: BroadcastHashJoinExec => m("bhj") += 1
      case _: ShuffledHashJoinExec => m("shj") += 1
      case _: BroadcastNestedLoopJoinExec => m("bnlj") += 1
      case _: CartesianProductExec => m("cartesian") += 1
      case _: SortExec => m("sort") += 1
      case _: WindowExec => m("window") += 1
      case _: ExpandExec => m("expand") += 1
      case _ => ()
    }
    keys.map(k => k -> m(k)).toMap
  }

  def render(name: String, m: Map[String, Int]): String =
    name + " " + keys.map(k => s"$k=${m(k)}").mkString(" ")

  /** Parse a `plan_budgets.txt`-format file: `name k=v k=v ...` lines,
    * `#` comments. */
  def parseBudgets(path: java.nio.file.Path): Map[String, Map[String, Int]] =
    java.nio.file.Files.readString(path).linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        parts.head -> parts.tail.map { kv =>
          val Array(k, v) = kv.split("="); k -> v.toInt
        }.toMap
      }.toMap
}
