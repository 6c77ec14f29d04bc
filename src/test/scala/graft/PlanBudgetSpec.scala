package graft

import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape regression budget over the ENTIRE declared inventory.
  *
  * `PlanSpec` hand-pins the ~30 plans with a named 100 TB story; this
  * suite freezes the physical node counts — scans, exchanges, join
  * strategies, sorts, windows, Expands — of ALL queries against a
  * committed budget (`plan_budgets.txt`), so ANY refactor that silently
  * adds a shuffle, flips a broadcast join to a shuffled one, or doubles a
  * scan fails loudly with a per-query diff, not just on the hand-pinned
  * subset. Counted on the PREPARED physical plan (post-EnsureRequirements,
  * so exchanges and SMJ sorts are present; AQE disabled during planning so
  * no adaptive wrapper hides them) at sf0.001 — deterministic for fixed
  * code + fixed testdata. `ReusedExchangeExec` is deliberately NOT
  * matched: the counts reflect exchanges that do work, not plan
  * references to one.
  *
  * When a plan change is INTENDED (or the driver regenerates testdata and
  * a borderline broadcast flips): re-run with
  * `GRAFT_REGEN_PLAN_BUDGETS=1 sbt "testOnly graft.PlanBudgetSpec"`,
  * review the `plan_budgets.txt` diff like any other code change, and
  * commit it.
  */
class PlanBudgetSpec extends SparkSpec {

  private val keys = Seq("scan", "shuffle", "broadcast", "smj", "bhj", "shj",
    "bnlj", "cartesian", "sort", "window", "expand")

  private def shape(plan: SparkPlan): Map[String, Int] = {
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

  private def render(name: String, m: Map[String, Int]): String =
    name + " " + keys.map(k => s"$k=${m(k)}").mkString(" ")

  private val budgetFile = java.nio.file.Paths.get("plan_budgets.txt")

  private def parseBudgets(): Map[String, Map[String, Int]] =
    java.nio.file.Files.readString(budgetFile).linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        parts.head -> parts.tail.map { kv =>
          val Array(k, v) = kv.split("="); k -> v.toInt
        }.toMap
      }.toMap

  test("every query's physical plan matches its committed shape budget") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val shapes =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        SparkEntry.defs.sortBy(_.name).map { q =>
          q.name -> shape(q.fn(spark, sf()).queryExecution.executedPlan)
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    if (sys.env.contains("GRAFT_REGEN_PLAN_BUDGETS") ||
        !java.nio.file.Files.exists(budgetFile)) {
      val header =
        """|# Physical-plan node-count budget per declared query (PlanBudgetSpec).
           |# Counted on the prepared physical plan (exchanges present, AQE off,
           |# reused exchanges uncounted) at sf0.001. Regenerate after an
           |# INTENDED plan change with GRAFT_REGEN_PLAN_BUDGETS=1 and review
           |# the diff: a new shuffle/scan/sort here is a scale regression.
           |""".stripMargin
      java.nio.file.Files.writeString(budgetFile,
        header + shapes.map((render _).tupled).mkString("", "\n", "\n"))
      info(s"wrote ${shapes.size} plan budgets to $budgetFile")
    } else {
      val want = parseBudgets()
      val missing = shapes.map(_._1).filterNot(want.contains)
      val stale = want.keys.filterNot(shapes.map(_._1).toSet)
      val diffs = shapes.flatMap { case (n, got) =>
        want.get(n).filter(_ != got).map(w =>
          s"  $n:\n    want ${render(n, w)}\n    got  ${render(n, got)}")
      }
      assert(missing.isEmpty && stale.isEmpty && diffs.isEmpty,
        s"""plan shapes diverged from plan_budgets.txt
           |new queries without a budget: ${missing.mkString(", ")}
           |budgets without a query: ${stale.mkString(", ")}
           |${diffs.mkString("\n")}
           |If intended: GRAFT_REGEN_PLAN_BUDGETS=1 sbt "testOnly graft.PlanBudgetSpec"
           |then review and commit the diff.""".stripMargin)
    }
  }
}
