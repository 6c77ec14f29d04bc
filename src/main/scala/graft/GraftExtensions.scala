package graft

import graft.functions.{DotProduct, Md5Long56, SimhashAgg, SortedIntersect, SubwordCount, TopKAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extension registering the engine's custom Catalyst expressions
  * as SQL functions, so `spark.sql("SELECT dot_product(a, b)")` works the
  * same as the Column API. Activate with either:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * This is the (c)-tier integration point from SURVEY.md §7.0's preference
  * order. No custom plans or strategies are needed for the engine's
  * SEMANTICS (§4) — every operator's meaning is expressible in stock
  * Catalyst; the one injected optimizer rule ([[graft.plans.MvRewrite]])
  * is a pure OPTIMIZATION: it routes structurally-matching aggregates to
  * maintained materialized-view state and never changes results.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(graft.plans.MvRewrite.apply)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("md5long56"),
      new ExpressionInfo(classOf[Md5Long56].getName, "md5long56"),
      (args: Seq[Expression]) => Md5Long56(args.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "simhash_agg"),
      (args: Seq[Expression]) =>
        SimhashAgg(args(0), args(1), litInt(args(2), "simhash_agg bits"))))
    e.injectFunction((
      new FunctionIdentifier("top_k_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k_agg"),
      (args: Seq[Expression]) =>
        TopKAgg(args(0), args(1), litInt(args(2), "top_k_agg k"))))
    e.injectFunction((
      new FunctionIdentifier("subword_count"),
      new ExpressionInfo(classOf[SubwordCount].getName, "subword_count"),
      (args: Seq[Expression]) => SubwordCount(args.head)))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName, "sorted_intersect"),
      (args: Seq[Expression]) => SortedIntersect(args(0), args(1))))
  }

  /** Shape parameters (bits, k) size the aggregation buffer, so they must
    * be plan-time constants — reject anything but an int literal loudly. */
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an INTEGER literal, got: ${other.sql}")
  }
}
