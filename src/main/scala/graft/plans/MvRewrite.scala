package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, BoundReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
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
  * Matching is CANONICAL-EXACT on the FILTER-STRIPPED aggregate subtree:
  * filters between the aggregate and its source are stripped from both
  * the query and the definition before comparison, then the two filter
  * sets are reconciled — every definition filter must be matched
  * (canonically) by a query filter, because the state only holds rows
  * passing them (this is what makes a FILTERED view — "last 90 days"
  * partials — servable at all); the query-side residual is re-applied,
  * remapped onto the view's output columns, above the replacement scan
  * (exact path) or below the re-aggregation (roll-up path), and must
  * reference group keys only. Canonical comparison (normalized expr ids,
  * both sides fully optimized by the SAME optimizer before this batch
  * runs) means false positives are structurally impossible; anything
  * weaker — extra aggregates, different rounding, a definition filter
  * the query lacks, a residual on a non-key column — is left untouched.
  * Correct-but-narrow beats clever-but-wrong for a rewrite that silently
  * changes what a query scans.
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
object MvRewrite {

  /** Collect filter conditions between the aggregate and its source,
    * looking through alias-free projections (column pruning inserts one
    * below the aggregate; predicate pushdown may sit the filter above or
    * below it). Stripping is only sound because every stripped condition
    * is accounted for during matching — def-side conditions must be
    * matched by user-side ones (the state already filtered those rows),
    * and the user-side residual is re-applied above the replacement. */
  private[graft] def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Deep-normalize a roll-up BASE for comparison across queries that
    * differ only in optimizer-inserted pruning and pushdown: strip
    * alias-free Projects everywhere in the tree and hoist deterministic
    * Filter conjuncts out of INNER-join inputs (hoisting above an inner
    * join is semantics-preserving; any other node type leaves its subtree
    * untouched, so a structural mismatch simply refuses). Returns the
    * normalized tree plus the hoisted conjuncts — expressed over relation
    * attributes, which stripping leaves intact, so they reconcile through
    * the same residual machinery as top-level filters.
    *
    * Why this exists: for an Aggregate(Join(fact, dim)) definition, a
    * coarser user query needs FEWER columns and pushes its filters INTO
    * different join children than the definition did — column pruning and
    * predicate pushdown rewrite the join's children differently on each
    * side, so the plain canonical comparison of the bases never matches
    * and the SAME star-join view would refuse every roll-up. */
  private[graft] def normalizeBase(p: LogicalPlan): (LogicalPlan, Seq[Expression]) =
    p match {
      case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        normalizeBase(pr.child)
      case Filter(cond, child) if cond.deterministic =>
        val (b, cs) = normalizeBase(child)
        (b, conjuncts(cond) ++ cs)
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        val (lb, lcs) = normalizeBase(j.left)
        val (rb, rcs) = normalizeBase(j.right)
        (j.copy(left = lb, right = rb), lcs ++ rcs)
      case other => (other, Seq.empty)
    }

  private[graft] def splitFilters(plan: LogicalPlan): (Seq[Expression], LogicalPlan) =
    plan match {
      case Filter(cond, child) =>
        val (cs, p) = splitFilters(child)
        // conjunct granularity: `cut AND key='A'` must reconcile against a
        // definition whose own filter is just `cut`
        (conjuncts(cond) ++ cs, p)
      case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        val (cs, inner) = splitFilters(p.child)
        (cs, p.copy(child = inner))
      case other => (Seq.empty, other)
    }

  /** The canonical match key of a definition: its aggregate with the
    * filters between aggregate and source stripped, canonicalized. Using
    * the STRIPPED form on both sides is what lets a filtered definition
    * ("last 90 days" partials) match at all — the filter sets are then
    * compared separately. */
  private[graft] def stripCanonical(agg: Aggregate): LogicalPlan = {
    val (_, stripped) = splitFilters(agg.child)
    agg.copy(child = stripped).canonicalized
  }

  /** Decompose `plan` into (base, filter conjuncts expressed over base
    * attributes, substitution fn rewriting plan-output-level expressions
    * to base-level ones) by walking down through Filters and
    * DETERMINISTIC Projects, inlining each project's aliases into
    * everything collected above it. The optimizer's
    * `PullOutGroupingExpressions` materializes complex group keys as
    * `_groupingexpression` columns in a COMPUTING Project below the
    * aggregate — roll-up matching must see through it or every
    * complex-key view refuses. None — refusing the whole roll-up — on ANY
    * nondeterminism in the walked region: a nondeterministic projection
    * (a pulled-out `_nondeterministic` group key) re-partitions SOURCE
    * rows, not state rows, and a nondeterministic filter (rand()
    * sampling) canceled between definition and query would serve the
    * sample frozen at refresh time instead of drawing a fresh one. Both
    * must refuse HERE: apply()'s splitFilters guard cannot see filters
    * below a computing Project, and two same-seed rand() trees are
    * canonically equal, so the base-equality fence alone would pass. */
  private[graft] def decompose(plan: LogicalPlan)
      : Option[(LogicalPlan, Seq[Expression], Expression => Expression)] =
    plan match {
      case Filter(cond, child) =>
        if (!cond.deterministic) None
        else decompose(child).map { case (b, cs, sub) =>
          (b, conjuncts(cond).map(sub) ++ cs, sub)
        }
      case pr: Project =>
        if (!pr.projectList.forall(_.deterministic)) None
        else decompose(pr.child).map { case (b, cs, subChild) =>
          val m: Map[Long, Expression] = pr.projectList.map {
            case a @ Alias(e, _) => a.exprId.id -> e
            case ne => ne.exprId.id -> (ne.toAttribute: Expression)
          }.toMap
          val sub: Expression => Expression = e => subChild(e.transformUp {
            case ar: AttributeReference if m.contains(ar.exprId.id) =>
              m(ar.exprId.id)
          })
          (b, cs, sub)
        }
      case other => Some((other, Seq.empty, identity[Expression] _))
    }
}

case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import MvRewrite.splitFilters

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // candidate order is part of the rewrite's contract: registered() reads
    // a Map (arbitrary iteration order past 4 entries), and several views
    // can legitimately serve the same roll-up. Prefer the view with the
    // FEWEST grouping keys — coarser partials ⇒ fewer stored groups ⇒ the
    // cheapest state to re-aggregate (the only cost model available without
    // stats) — name as the total-order tie-break. Any candidate yields the
    // same ROWS (the soundness gates in rollup() don't depend on order);
    // this pins WHICH state gets scanned, so plans are reproducible.
    val mvs = MaterializedView.registered(spark)
      .sortBy(mv => (mv.defAgg.groupingExpressions.size, mv.name))
    if (mvs.isEmpty || MaterializedView.isBypassing) plan
    else plan.transformDown {
      // a NON-DETERMINISTIC stripped filter (rand() sampling and kin) can
      // never be compensated: re-evaluated above the state scan it samples
      // whole groups with their full stored aggregates instead of sampling
      // source rows — and it vacuously passes the key-reference check
      // (rand() references no columns). Refuse the aggregate outright.
      case agg: Aggregate if splitFilters(agg.child)._1.forall(_.deterministic) =>
        val (conds, stripped) = splitFilters(agg.child)
        val candidate = agg.copy(child = stripped)
        // exact match first; if it is refused (schema drift, unmatched
        // definition filter, non-key residual), the roll-up path over ANY
        // registered view still gets its chance — a drifted view A must
        // not shadow a healthy view B
        mvs.find(_.canonicalAgg == candidate.canonicalized)
          .flatMap(mv => rewrite(agg, conds, stripped, mv))
          .orElse {
            // decompose the user side ONCE per aggregate; each candidate
            // view brings its own registration-time defDecomp. (No key-
            // arity pre-filter here: remap() derives user keys from stored
            // keys recursively, so a user aggregate may legitimately have
            // MORE grouping expressions than the view it rolls up —
            // e.g. year(d), month(d) over a stored d.)
            MvRewrite.decompose(agg.child).flatMap(udec =>
              mvs.view.flatMap(mv => rollup(agg, udec, mv)).headOption)
          }
          .getOrElse(agg)
    }
  }

  /** Split `userConds` against a definition's own stripped filters: every
    * definition condition must be matched (canonically, normalized against
    * the respective plan's output so expr ids don't matter) by a user
    * condition — the state only holds rows passing them, so an unmatched
    * one means the state is the WRONG subset and the rewrite must refuse.
    * Returns the user-side residual (conditions the state did not already
    * apply) to be compensated by the caller; None = refuse. */
  private def residualConds(userConds: Seq[Expression], userOut: Seq[Attribute],
      defConds: Seq[Expression], defOut: Seq[Attribute]): Option[Seq[Expression]] = {
    if (defConds.isEmpty) return Some(userConds)
    val dNorm = defConds.map(c => normalize(c, defOut))
    val uNorm = userConds.map(c => normalize(c, userOut))
    if (dNorm.exists(_.isEmpty) || uNorm.exists(_.isEmpty)) return None
    val dSet = dNorm.flatten.toSet
    val uSet = uNorm.flatten.toSet
    if (!dSet.subsetOf(uSet)) None
    else Some(userConds.zip(uNorm).collect {
      case (c, Some(n)) if !dSet.contains(n) => c
    })
  }

  private def rewrite(agg: Aggregate, userConds: Seq[Expression],
      stripped: LogicalPlan, mv: MaterializedView.Mv): Option[LogicalPlan] = {
    val (dConds, dStripped) = splitFilters(mv.defAgg.child)
    // normalize against the BASES (conditions may reference columns the
    // pruning Project above them dropped — a filter column is not
    // necessarily an output column); the stripped trees are canonically
    // equal (the match key), so the base outputs correspond positionally
    val conds = residualConds(userConds, baseOf(stripped).output,
      dConds, baseOf(dStripped).output) match {
      case None => return None
      case Some(r) => r
    }
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

  // ---------------------------------------------------------------------
  // Roll-up rewrite: the user groups by a SUBSET of the view's keys (or
  // none), and every output is derivable by RE-AGGREGATING the stored
  // per-group partials: sum(x) → sum(view.sum_x), count(*) → sum(view
  // .cnt), min/max(x) → min/max(view.minmax_x), group keys → view key
  // columns. This is only sound because the view's groups PARTITION the
  // source rows — any coarser grouping is a disjoint union of stored
  // groups. Refused loudly-by-absence for anything outside that algebra:
  // DISTINCT aggregates (not unionable from partials), FILTER clauses,
  // avg/stddev as opaque functions (derived avg = sum/count re-maps fine
  // because its pieces do), aggregates of expressions the view didn't
  // store, filters on non-key columns. The final output-type gate also
  // rejects derivations that widen a type (e.g. a bare re-summed DECIMAL
  // gains precision; under a cast — the house style — it stays identical).
  // ---------------------------------------------------------------------

  /** Normalize `e` against `out` by replacing each attribute with its
    * ordinal — comparable across plans whose children are canonically
    * equal. None if `e` references anything outside `out`. */
  private def normalize(e: Expression, out: Seq[Attribute]): Option[Expression] = {
    val pos = out.map(_.exprId).zipWithIndex.toMap
    var ok = true
    val n = e.transform {
      case a: AttributeReference => pos.get(a.exprId) match {
        case Some(i) => BoundReference(i, a.dataType, nullable = true)
        case None => ok = false; a
      }
    }
    if (ok) Some(n.canonicalized) else None
  }

  private def isCountStar(c: Count): Boolean = c.children match {
    case Seq(l: Literal) => l.value != null
    case _ => false
  }

  /** The plan beneath any alias-free projections — column pruning sizes
    * those differently per query (the user side keeps filter-only columns
    * the definition never needed), so roll-up matching compares BASES and
    * normalizes expressions against base outputs, where canonical
    * equality makes positions correspond 1:1. */
  private def baseOf(p: LogicalPlan): LogicalPlan = p match {
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseOf(pr.child)
    case other => other
  }

  private def rollup(agg: Aggregate,
      udec: (LogicalPlan, Seq[Expression], Expression => Expression),
      mv: MaterializedView.Mv): Option[LogicalPlan] = {
    val defAgg = mv.defAgg
    // both children are decomposed down to their bases, inlining
    // deterministic projections (see MvRewrite.decompose — complex group
    // keys live in a computing `_groupingexpression` Project the plain
    // filter-strip cannot see through) with filter conjuncts over base
    // attrs; the user side arrives precomputed, the def side is cached on
    // the registration
    val (ucBase, uConds0, uSub) = udec
    val (dcBase, dConds0, dSub) = mv.defDecomp match {
      case Some(t) => t
      case None => return None
    }
    // deep-normalize both bases (strip pruning Projects, hoist pushed-down
    // filters out of inner-join children) — required for join bases, a
    // no-op for single-relation ones; hoisted conjuncts join their side's
    // filter set and reconcile below like any other condition
    val (ucB, uHoist) = MvRewrite.normalizeBase(ucBase)
    val (dcB, dHoist) = MvRewrite.normalizeBase(dcBase)
    if (ucB.canonicalized != dcB.canonicalized) return None
    val uConds = uConds0 ++ uHoist
    val dConds = dConds0 ++ dHoist
    // a filtered definition serves iff the user query applies (at least)
    // the same filters — the state holds exactly the rows passing them;
    // only the user-side residual needs compensating below the re-agg
    val conds = residualConds(uConds, ucB.output,
      dConds, dcB.output) match {
      case None => return None
      case Some(r) => r
    }
    val readPlan = mv.read().queryExecution.analyzed
    val defOut = defAgg.output
    if (readPlan.output.length != defOut.length ||
        !defOut.zip(readPlan.output).forall { case (o, n) =>
          o.dataType == n.dataType && o.name.equalsIgnoreCase(n.name) })
      return None // state schema drifted — same gate as the exact path

    // catalog what the view stored, keyed by expressions normalized
    // against each side's OWN normalized-base output (comparable: bases
    // match canonically, so positions correspond; stripping only WIDENS an
    // output, so every base-level attribute stays resolvable).
    // Aggregate-level expressions reference their child's output — e.g.
    // a pulled-out `_groupingexpression` column — so substitute down to
    // base level first, then ordinal-bind.
    val dcOut = dcB.output
    val ucOut = ucB.output
    def dnorm(e: Expression): Option[Expression] = normalize(dSub(e), dcOut)
    def unorm(e: Expression): Option[Expression] = normalize(uSub(e), ucOut)
    def defCol(i: Int): Attribute = readPlan.output(i)
    val keys = scala.collection.mutable.Map.empty[Expression, Int]
    val sums = scala.collection.mutable.Map.empty[Expression, Int]
    val mins = scala.collection.mutable.Map.empty[Expression, Int]
    val maxs = scala.collection.mutable.Map.empty[Expression, Int]
    val cnts = scala.collection.mutable.Map.empty[Expression, Int]
    var cnt: Option[Int] = None
    defAgg.aggregateExpressions.zipWithIndex.foreach {
      case (a: AttributeReference, i) =>
        dnorm(a).foreach(keys(_) = i)
      case (Alias(ae: AggregateExpression, _), i)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case s: Sum => dnorm(s.child).foreach(sums(_) = i)
          case m: Min => dnorm(m.child).foreach(mins(_) = i)
          case m: Max => dnorm(m.child).foreach(maxs(_) = i)
          case c: Count if isCountStar(c) => cnt = Some(i)
          // count(col): the state stores the per-group NON-NULL count —
          // a coarser count(col) is the sum of those partials
          case c: Count if c.children.size == 1 =>
            dnorm(c.children.head).foreach(cnts(_) = i)
          case _ => ()
        }
      case (Alias(e, _), i) if !e.exists(_.isInstanceOf[AggregateExpression]) =>
        dnorm(e).foreach(keys(_) = i) // complex/aliased group key
      case _ => ()
    }

    // remap one user expression onto the state columns; None = underivable
    def remap(e: Expression): Option[Expression] = e match {
      // a nondeterministic expression must never re-evaluate over state
      // rows (GROUP BY rand() means one group per SOURCE row, not per
      // stored group). The analyzer's PullOutNondeterministic already
      // blocks these structurally — the pulled-out Project fails the base
      // equality gate — but that is an invariant of somebody else's code;
      // refuse locally too so a future analyzer change cannot open it.
      case _ if !e.deterministic => None
      case ae: AggregateExpression if ae.isDistinct || ae.filter.isDefined =>
        None
      case ae: AggregateExpression => ae.aggregateFunction match {
        case s: Sum => unorm(s.child).flatMap(sums.get).map(i =>
          ae.copy(aggregateFunction = s.copy(child = defCol(i)),
            resultId = NamedExpression.newExprId))
        // count(*) re-aggregates as sum(cnt), which is NULL (not 0) over
        // zero matching state rows — a global aggregate whose key filter
        // matches no stored group must still return 0, hence the coalesce
        case c: Count if isCountStar(c) => cnt.map(i =>
          org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
            ae.copy(aggregateFunction = Sum(defCol(i)),
              resultId = NamedExpression.newExprId),
            Literal(0L))))
        case m: Min => unorm(m.child).flatMap(mins.get).map(i =>
          ae.copy(aggregateFunction = Min(defCol(i)),
            resultId = NamedExpression.newExprId))
        case m: Max => unorm(m.child).flatMap(maxs.get).map(i =>
          ae.copy(aggregateFunction = Max(defCol(i)),
            resultId = NamedExpression.newExprId))
        // count(col) re-aggregates as sum(stored non-null-count partials);
        // same zero-state coalesce rationale as count(*)
        case c: Count if !isCountStar(c) && c.children.size == 1 =>
          unorm(c.children.head).flatMap(cnts.get).map(i =>
            org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(defCol(i)),
                resultId = NamedExpression.newExprId),
              Literal(0L))))
        // first/any_value(k) over a stored GROUP KEY, sound ONLY when the
        // user also groups by (an expression canonically equal to) k —
        // then k is constant within every re-agg group, so first() over
        // state rows returns exactly what source evaluation would. A
        // first() whose child varies within the group stays refused:
        // state-row order could pick a different witness than source-row
        // order, silently changing answers.
        case f: org.apache.spark.sql.catalyst.expressions.aggregate.First =>
          unorm(f.child).flatMap { nc =>
            val constPerGroup = agg.groupingExpressions.exists(g =>
              unorm(g).contains(nc))
            if (!constPerGroup) None
            else keys.get(nc).map(i =>
              ae.copy(aggregateFunction = f.copy(child = defCol(i)),
                resultId = NamedExpression.newExprId): Expression)
          }
        case _ => None
      }
      case a: AttributeReference =>
        unorm(a).flatMap(keys.get).map(defCol)
      case other =>
        // a COMPLEX group key the view stored (e.g. concat(a, b)) matches
        // as a WHOLE before recursing into pieces the state never kept —
        // keys holds only aggregate-free definition expressions, so an
        // aggregate-bearing `other` can never false-positive here
        unorm(other).flatMap(keys.get).map(defCol).orElse {
          val kids = other.children.map(remap)
          if (kids.exists(_.isEmpty)) None
          else Some(other.withNewChildren(kids.map(_.get)))
        }
    }

    val newGrouping = agg.groupingExpressions.map(remap)
    val newAggs = agg.aggregateExpressions.map {
      case al @ Alias(child, name) =>
        remap(child).map(n => Alias(n, name)(exprId = al.exprId,
          qualifier = al.qualifier))
      case a: AttributeReference =>
        remap(a).map(n => Alias(n, a.name)(exprId = a.exprId,
          qualifier = a.qualifier))
      case _ => None
    }
    val newConds = conds.map(remap) // key-only filters drop below the re-agg
    if ((newGrouping ++ newAggs ++ newConds).exists(_.isEmpty)) return None

    val source = newConds.map(_.get).reduceOption(And) match {
      case Some(cond) => Filter(cond, readPlan)
      case None => readPlan
    }
    val rolled = Aggregate(newGrouping.map(_.get),
      newAggs.map(_.get.asInstanceOf[NamedExpression]), source)
    // type gate: a derivation that widens any output type is refused
    if (rolled.output.zip(agg.output).forall { case (n, o) =>
        n.dataType == o.dataType }) {
      logInfo(s"mv ${mv.name}: rolled up aggregate onto maintained partials")
      Some(rolled)
    } else None
  }
}
