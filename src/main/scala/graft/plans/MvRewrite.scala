package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.api.MaterializedView

/** Materialized-view query rewrite — the READ path of incremental view
  * maintenance. [[graft.streaming.IncrementalAgg]] keeps a stored
  * aggregate current without rescanning history (the write path); this
  * rule makes queries USE it: an `Aggregate` that is structurally the
  * registered view definition is replaced by a scan of the maintained
  * result, turning a full-corpus aggregation into a model-sized state
  * read. At 100 TB that is the difference between a cluster-wide scan and
  * a single-executor lookup — the same rewrite Snowflake/BigQuery MVs
  * perform, absent from stock Spark.
  *
  * Matching is CANONICAL-EXACT on the aggregate subtree, with one
  * compensation: filters that Catalyst pushed below the aggregate (a
  * `WHERE` on group keys always is) are stripped before comparison and
  * re-applied — remapped onto the view's output columns — above the
  * replacement scan. Canonical comparison (normalized expr ids, both
  * sides fully optimized by the SAME optimizer before this batch runs)
  * means false positives are structurally impossible; anything weaker
  * than an exact match — extra aggregates, different rounding, a filter
  * on a non-key column — is left untouched. Correct-but-narrow beats
  * clever-but-wrong for a rewrite that silently changes what a query
  * scans.
  *
  * The replacement keeps the original output attribute ids (aliases
  * pinned to the old expr ids), so parents — sorts, projections, joins —
  * are oblivious. The rewrite only fires when the view's read-back
  * schema matches the definition position-for-position in name and type;
  * a drifted state layout disables the rewrite rather than corrupting
  * results.
  *
  * Reference analog: the reference maintains windowed aggregates in its
  * stream state but has no planner to route ad-hoc queries to them
  * (HayaKus/datastream-processing-demo R14); on Spark the Catalyst
  * extension point makes the routing declarative.
  */
case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvs = MaterializedView.registered(spark)
    if (mvs.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        val (conds, stripped) = splitFilters(agg.child)
        val candidate = agg.copy(child = stripped)
        mvs.find(_.canonicalAgg == candidate.canonicalized) match {
          case Some(mv) => rewrite(agg, conds, mv).getOrElse(agg)
          case None => agg
        }
    }
  }

  /** Collect filter conditions between the aggregate and its source,
    * looking through alias-free projections (column pruning inserts one
    * below the aggregate; predicate pushdown may sit the filter above or
    * below it). Stripping is only sound because the conditions are
    * re-applied above the replacement — and only attempted at all when
    * the stripped tree matches a definition exactly. */
  private def splitFilters(plan: LogicalPlan): (Seq[Expression], LogicalPlan) =
    plan match {
      case Filter(cond, child) =>
        val (cs, p) = splitFilters(child)
        (cond +: cs, p)
      case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        val (cs, inner) = splitFilters(p.child)
        (cs, p.copy(child = inner))
      case other => (Seq.empty, other)
    }

  private def rewrite(agg: Aggregate, conds: Seq[Expression],
      mv: MaterializedView.Mv): Option[LogicalPlan] = {
    val readPlan = mv.read().queryExecution.analyzed
    val out = agg.output
    if (readPlan.output.length != out.length ||
        !out.zip(readPlan.output).forall { case (o, n) =>
          o.dataType == n.dataType && o.name.equalsIgnoreCase(n.name) }) {
      logWarning(s"mv ${mv.name}: read-back schema drifted from the " +
        s"definition (${readPlan.output.map(a => s"${a.name}:${a.dataType}")}" +
        s" vs ${out.map(a => s"${a.name}:${a.dataType}")}); rewrite skipped")
      None
    } else {
      // group-key attr (by expr id) -> position in the aggregate output,
      // for remapping stripped filter conditions onto the view's columns
      val keyIndex: Map[Long, Int] =
        agg.aggregateExpressions.zipWithIndex.collect {
          case (ar: AttributeReference, i) => ar.exprId.id -> i
          case (Alias(ar: AttributeReference, _), i) => ar.exprId.id -> i
        }.toMap
      val mappable = conds.forall(_.references.forall(a =>
        keyIndex.contains(a.exprId.id)))
      if (!mappable) None // a pushed filter on a non-key column: no rewrite
      else {
        val aliases: Seq[NamedExpression] = out.zip(readPlan.output).map {
          case (o, n) => Alias(n, o.name)(exprId = o.exprId,
            qualifier = o.qualifier)
        }
        val scan: LogicalPlan = Project(aliases, readPlan)
        val guarded = conds.reduceOption(And) match {
          case Some(cond) =>
            val remapped = cond.transform {
              case a: AttributeReference => out(keyIndex(a.exprId.id))
            }
            Filter(remapped, scan)
          case None => scan
        }
        logInfo(s"mv ${mv.name}: rewrote aggregate to maintained state")
        Some(guarded)
      }
    }
  }
}
