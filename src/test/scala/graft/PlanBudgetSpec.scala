package graft

import graft.plans.PlanCensus

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

  // single census definition shared with TpchScaleBench — see PlanCensus
  private def shape(plan: org.apache.spark.sql.execution.SparkPlan) =
    PlanCensus.shape(plan)
  private def render(name: String, m: Map[String, Int]) =
    PlanCensus.render(name, m)
  private val budgetFile = java.nio.file.Paths.get("plan_budgets.txt")
  private def parseBudgets() = PlanCensus.parseBudgets(budgetFile)

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
