package graft

/** Plan-audit helper: print a declared query's prepared physical plan
  * (AQE off, same census conditions as PlanBudgetSpec) without timing it.
  *
  *   sbt "runMain graft.PlanPeek q_sim_ivf [sfDir]"
  *
  * The per-query counterpart of `GRAFT_TPCH_EXPLAIN` in TpchScaleBench —
  * use it to review a plan_budgets.txt diff line by line. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Bench.tunedSession("plan-peek")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val name = args.headOption.getOrElse("q_sim_ivf")
    val df = SparkEntry.queries(name)(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
