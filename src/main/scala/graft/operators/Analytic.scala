package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic extensions beyond the relational spine (SURVEY.md §2.B):
  * pivot, cube, exact percentiles, deterministic stratified sampling, and
  * time-series gap-filling — the reporting/curation operators a user of a
  * general engine reaches for next.
  *
  * Scale notes:
  *   - [[qPivot]] passes the pivot values EXPLICITLY: `pivot(col)` without
  *     values runs an eager distinct-collect job over the fact table at
  *     plan time — at 100 TB that is a full extra pass before the query
  *     even starts;
  *   - [[qAggCube]]/cube expands each input row into 2^k grouping
  *     combinations BEFORE the shuffle but the aggregate stays map-side
  *     combined, so the shuffle carries (groups × 2^k) partial rows, not
  *     data rows;
  *   - [[qPercentiles]] uses exact `percentile` (sort-based within group;
  *     only 3 groups here). For high-cardinality groups at 100 TB the
  *     approx sketch (`q_agg_approx`) is the scale path — both are
  *     declared, the choice is the caller's accuracy/cost tradeoff;
  *   - [[qSampleStratified]] is a narrow deterministic predicate
  *     ([[graft.api.Sampling]]) — no shuffle, replay-safe, pushed to the
  *     scan;
  *   - [[qGapfill]] builds the dense grid from per-series spans via
  *     `sequence`+`explode` — grid size ∝ series × slots, never a
  *     cross-join of the fact table.
  */
object Analytic {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)"))

  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PrioCols =
    Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")

  /** Pivot: order counts by status × priority. Values are explicit (no
    * plan-time distinct scan); sanitized column names keep both engines'
    * identifier rules out of the comparison. */
  val qPivot: QueryDef = QueryDef.sql(
    "q_pivot",
    s"""SELECT o_orderstatus AS status,
       |${Priorities.zip(PrioCols).map { case (v, c) =>
             s"       count(*) FILTER (WHERE o_orderpriority = '$v') AS $c" }
           .mkString(",\n")}
       |FROM orders
       |GROUP BY o_orderstatus
       |ORDER BY status""".stripMargin) { (s, d) =>
    val pivoted = Tables.orders(s, d)
      .groupBy(col("o_orderstatus").as("status"))
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))
    val renamed = Priorities.zip(PrioCols).foldLeft(pivoted) {
      case (df, (v, c)) => df.withColumnRenamed(v, c)
    }
    // a (status, priority) combo with zero rows pivots to null; count
    // semantics (and the oracle's FILTER form) want 0
    renamed.select(col("status") +:
        PrioCols.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy("status")
  }

  /** CUBE over (returnflag, linestatus): all 2^2 grouping combinations in
    * one pass. Same coalesce convention as q_agg_rollup (no real nulls in
    * the grouping columns). */
  val qAggCube: QueryDef = QueryDef.sql(
    "q_agg_cube",
    """SELECT coalesce(l_returnflag, '<all>') AS rflag,
      |       coalesce(l_linestatus, '<all>') AS lstatus,
      |       count(*) AS cnt,
      |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        round(dsum(col("l_quantity")).cast("double"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("rflag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("lstatus"),
        col("cnt"), col("sum_qty"))
      .orderBy("rflag", "lstatus")
  }

  /** Exact percentiles (p25/p50/p75 linear interpolation) per return flag.
    * Only dyadic fractions are declared: their interpolation weights are
    * exact powers of two, so `lo + (hi-lo)·f` and `(1-f)·lo + f·hi` agree
    * bit-for-bit and the engines' differing formulations can't diverge. */
  val qPercentiles: QueryDef = QueryDef.sql(
    "q_percentiles",
    """SELECT l_returnflag,
      |       count(*) AS n,
      |       round(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |       round(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |       round(quantile_cont(l_quantity, 0.75), 4) AS p75,
      |       round(min(l_quantity), 4) AS qmin,
      |       round(max(l_quantity), 4) AS qmax
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("p25"),
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_quantity"), lit(0.75)), 4).as("p75"),
        round(min(col("l_quantity")), 4).as("qmin"),
        round(max(col("l_quantity")), 4).as("qmax"))
      .orderBy("l_returnflag")
  }

  /** Deterministic stratified sample of lineitem: per-flag Bernoulli rates
    * (A 10%, N 5%, R 25%) decided by an md5-derived bucket of the unique
    * row key ([[graft.api.Sampling]]) — replay-safe, engine-reproducible,
    * no shuffle. One pass computes totals and sampled aggregates. */
  val qSampleStratified: QueryDef = QueryDef.sql(
    "q_sample_stratified",
    s"""WITH k AS (
       |  SELECT l_returnflag, l_quantity,
       |         ${graft.functions.CrossHash.md5LongSql(
                    "concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber)")} % 1000 AS bkt,
       |         CASE l_returnflag WHEN 'A' THEN 100 WHEN 'N' THEN 50 ELSE 250 END AS rate
       |  FROM lineitem
       |)
       |SELECT l_returnflag,
       |       count(*) AS n_total,
       |       count(*) FILTER (WHERE bkt < rate) AS n_sampled,
       |       round(CAST(count(*) FILTER (WHERE bkt < rate) AS DOUBLE) / count(*), 4) AS frac,
       |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) FILTER (WHERE bkt < rate) AS DOUBLE), 2) AS sampled_qty
       |FROM k
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val rate = when(col("l_returnflag") === "A", 100)
      .when(col("l_returnflag") === "N", 50).otherwise(250)
    val kept = graft.api.Sampling.bucket(1000,
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber")) < rate
    li.select(col("l_returnflag"), col("l_quantity"), kept.as("kept"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("kept"), 1)).as("n_sampled"),
        round(count(when(col("kept"), 1)).cast("double") / count(lit(1)), 4).as("frac"),
        round(dsum(when(col("kept"), col("l_quantity"))).cast("double"), 2).as("sampled_qty"))
      .orderBy("l_returnflag")
  }

  /** Time-series gap-fill: sparse per-hour aggregates densified onto each
    * series' full hour grid — zero-fill for counts, last-observation-
    * carried-forward for the value column (`last(..., ignoreNulls)` over
    * an ordered window; the grid starts at each series' first observed
    * hour, so LOCF never sees a leading null). */
  val qGapfill: QueryDef = QueryDef.sql(
    "q_gapfill",
    """WITH f AS (
      |  SELECT event_type, ts, value FROM events
      |  WHERE event_type IN ('purchase', 'error') AND value > 200
      |),
      |h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
      |         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
      |  FROM f GROUP BY 1, 2
      |),
      |span AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM h GROUP BY 1),
      |grid AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM span
      |)
      |SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:00') AS hour,
      |       coalesce(n, 0) AS n,
      |       last_value(sum_v IGNORE NULLS) OVER (
      |         PARTITION BY g.event_type ORDER BY g.h
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_sum_v
      |FROM grid g
      |LEFT JOIN h ON h.event_type = g.event_type AND h.h = g.h
      |ORDER BY g.event_type, hour""".stripMargin) { (s, d) =>
    val f = Tables.events(s, d)
      .where(col("event_type").isin("purchase", "error") && col("value") > 200)
    val hourly = f
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"),
        round(dsum(col("value")).cast("double"), 4).as("sum_v"))
    val grid = hourly
      .groupBy("event_type").agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(
        col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sum_v"), ignoreNulls = true).over(w).as("locf_sum_v"))
      .orderBy("event_type", "hour")
  }

  /** Distribution window functions: ntile buckets, percent_rank, cume_dist
    * per priority over the price order. The window ORDER BY includes the
    * unique key so rank-derived values are tie-free and deterministic.
    * One exchange on the partition key — same plan class as q_window_rank. */
  val qWindowDist: QueryDef = QueryDef.sql(
    "q_window_dist",
    """SELECT o_orderkey, o_orderpriority,
      |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |       round(percent_rank() OVER w, 4) AS pct_rank,
      |       round(cume_dist() OVER w, 4) AS cume
      |FROM orders
      |WHERE o_orderkey % 20 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .where(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("int").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Correlation / covariance / stddev from exact decimal moments: ONE
    * map-side-combined aggregation collects (n, Σx, Σy, Σxy, Σx², Σy²)
    * through DECIMAL partial sums — exact, partition-order independent —
    * then the closed-form statistics evaluate in double on the driver-side
    * of the aggregate. The builtin `corr`/`covar_samp` use streaming
    * co-moment accumulation whose float result depends on merge order (not
    * reproducible across partitionings, let alone engines); the moment
    * formulation is the 100 TB-deterministic shape and shuffles 6 numbers
    * per group. */
  val qCorrStats: QueryDef = QueryDef.sql(
    "q_corr_stats",
    """WITH m AS (
      |  SELECT l_returnflag,
      |         count(*) AS n,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sxy,
      |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
      |         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS syy
      |  FROM lineitem
      |  GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n,
      |       CASE WHEN n > 1 THEN
      |         round((n * sxy - sx * sy) / (n * (n - 1)), 4) END AS covar_s,
      |       CASE WHEN n > 1 THEN
      |         round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 4) END AS std_qty,
      |       CASE WHEN n > 1 THEN
      |         round(sqrt((n * syy - sy * sy) / (n * (n - 1))), 4) END AS std_price,
      |       CASE WHEN n > 1 AND n * sxx > sx * sx AND n * syy > sy * sy THEN
      |         round((n * sxy - sx * sy) /
      |               (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4) END AS corr_qp
      |FROM m
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val dec27 = (c: org.apache.spark.sql.Column) => sum(c.cast("decimal(27,6)"))
    val m = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).cast("double").as("sx"),
        dsum(col("l_extendedprice")).cast("double").as("sy"),
        dec27(col("l_quantity") * col("l_extendedprice")).cast("double").as("sxy"),
        dec27(col("l_quantity") * col("l_quantity")).cast("double").as("sxx"),
        dec27(col("l_extendedprice") * col("l_extendedprice")).cast("double").as("syy"))
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    // sample statistics are undefined at n=1 (and corr at zero variance):
    // NULL, not a divide-by-zero — the SQL-standard covar_samp convention,
    // guarded identically in the oracle so both engines agree
    m.select(
        col("l_returnflag"), n,
        when(n > 1,
          round((n * col("sxy") - sx * sy) / (n * (n - lit(1))), 4)).as("covar_s"),
        when(n > 1,
          round(sqrt((n * col("sxx") - sx * sx) / (n * (n - lit(1)))), 4)).as("std_qty"),
        when(n > 1,
          round(sqrt((n * col("syy") - sy * sy) / (n * (n - lit(1)))), 4)).as("std_price"),
        when(n > 1 && n * col("sxx") > sx * sx && n * col("syy") > sy * sy,
          round((n * col("sxy") - sx * sy) /
            (sqrt(n * col("sxx") - sx * sx) * sqrt(n * col("syy") - sy * sy)), 4)).as("corr_qp"))
      .orderBy("l_returnflag")
  }

  /** Grouped top-k via the bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]): top-3 orders by price per priority.
    * The window formulation (`row_number() OVER (PARTITION BY priority
    * ORDER BY price DESC)`) shuffles EVERY order row to 5 reducers — a
    * five-way sort of the whole table; the heap aggregate reduces each map
    * partition to ≤ 3 rows per priority BEFORE the exchange, so the
    * shuffle carries O(k × partitions) rows regardless of table size.
    * Values and order are identical to the window form (the oracle). */
  val qGroupedTopk: QueryDef = QueryDef.sql(
    "q_grouped_topk",
    """SELECT o_orderpriority AS priority, nid AS orderkey, rnk,
      |       round(price, 2) AS price
      |FROM (
      |  SELECT o_orderpriority, o_orderkey AS nid, o_totalprice AS price,
      |         CAST(row_number() OVER (PARTITION BY o_orderpriority
      |           ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3
      |ORDER BY priority, rnk""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(graft.functions.TopKAgg.top_k_agg(
        col("o_totalprice"), col("o_orderkey"), 3).as("tk"))
      .select(col("priority"), posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("priority"), col("x.id").as("orderkey"),
        (col("pos") + 1).cast("int").as("rnk"),
        round(col("x.score"), 2).as("price"))
      .orderBy("priority", "rnk")
  }

  /** HLL sketch mergeability — the property that makes approximate
    * distinct-counting work at 100 TB: per-slice sketches union-merged
    * MUST equal the whole-corpus sketch (so per-partition/per-day
    * sketches can be stored and combined without rescanning). The query
    * computes both paths over four deterministic slices and emits the
    * comparison plus the exact count; the oracle asserts the exact count
    * and that mergeability held (`true`) — the sketch itself stays
    * engine-internal, the INVARIANT is what's verified. */
  val qHllMerge: QueryDef = QueryDef.sql(
    "q_hll_merge",
    """SELECT count(DISTINCT user_id) AS n_exact,
      |       true AS merged_matches_whole
      |FROM events""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val whole = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_whole"),
      countDistinct(col("user_id")).as("n_exact"))
    val merged = ev
      .withColumn("slice", col("event_id") % 4)
      .groupBy("slice").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
    whole.crossJoin(merged)
      .select(col("n_exact"),
        (col("est_whole") === col("est_merged")).as("merged_matches_whole"))
  }

  /** Trailing exact median per user (5-reading ROWS frame) — the robust
    * running-statistic window shape (outlier-resistant counterpart of
    * `q_window_running`'s mean). Integer determinism: values milli-quantize
    * to BIGINT once, and a median of ≤5 integers is integral or
    * half-integral — doubling it (`med2`) makes every output an exact
    * BIGINT in both engines, no float interpolation left in the hash.
    * Scale shape: one shuffle on user_id, per-partition sorted frames; the
    * frame is O(1) per row (5 readings), so the window never materializes
    * history. */
  val qWindowMedian: QueryDef = QueryDef.sql(
    "q_window_median",
    """SELECT event_id, user_id,
      |       CAST(median(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) * 2 AS BIGINT) AS med2
      |FROM (SELECT event_id, user_id, ts, CAST(round(value * 1000) AS BIGINT) AS vm
      |      FROM events WHERE user_id % 7 = 0)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-4, 0)
    Tables.events(s, d)
      .filter(col("user_id") % 7 === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 1000).cast("long").as("vm"))
      .select(col("event_id"), col("user_id"),
        (expr("percentile(vm, 0.5)").over(w) * 2).cast("long").as("med2"))
      .orderBy("event_id")
  }

  /** Argmax/argmin aggregates (`max_by`/`min_by`, DuckDB `arg_max`/
    * `arg_min`): the whole-record-at-extreme shape that otherwise costs a
    * window + filter pass. Ties broken deterministically by folding the
    * unique key into the ordering value (cents · 10¹⁰ + custkey — monotone
    * lexicographic). REQUIREMENT: c_custkey < 10¹⁰ and |balance cents| <
    * 9·10⁸ (encoding headroom: cents·10¹⁰ stays under 2⁶³); both hold by
    * orders of magnitude at any TPC-H scale factor (SF 10⁵ ≈ 1.5·10¹⁰
    * rows total would still keep custkey in range). One map-side-combined
    * aggregate, no window, no join-back. */
  val qArgmax: QueryDef = QueryDef.sql(
    "q_argmax",
    """SELECT n.n_name,
      |       arg_max(c.c_name, CAST(round(c.c_acctbal * 100) AS BIGINT) * 10000000000 + c.c_custkey) AS richest,
      |       arg_min(c.c_name, CAST(round(c.c_acctbal * 100) AS BIGINT) * 10000000000 + c.c_custkey) AS poorest,
      |       round(max(c.c_acctbal), 2) AS max_bal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("ord",
        round(col("c_acctbal") * 100).cast("long") * 10000000000L + col("c_custkey"))
      .groupBy("n_name")
      .agg(
        expr("max_by(c_name, ord)").as("richest"),
        expr("min_by(c_name, ord)").as("poorest"),
        round(max(col("c_acctbal")), 2).as("max_bal"))
      .orderBy("n_name")
  }

  /** Daily cohort retention — the product-analytics grid: users bucketed
    * by FIRST-seen day, activity counted per (cohort, days-since) cell.
    * Two aggregates over events (first-touch, distinct active days) and
    * one join on user_id; at 100 TB both aggregates are map-side combined
    * and the join co-partitions on user_id — the grid itself is
    * cohort² -sized, i.e. model-sized. */
  val qCohort: QueryDef = QueryDef.sql(
    "q_cohort",
    """WITH firstd AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
      |),
      |activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      |SELECT cohort AS cohort_day,
      |       CAST(date_diff('day', cohort, d) AS INTEGER) AS days_since,
      |       CAST(count(*) AS BIGINT) AS n_active
      |FROM firstd JOIN activity USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("d"))
    val first = ev.groupBy("user_id").agg(min(col("d")).as("cohort"))
    val act = ev.distinct()
    first.join(act, "user_id")
      .groupBy(col("cohort").as("cohort_day"),
        datediff(col("d"), col("cohort")).cast("int").as("days_since"))
      .agg(count(lit(1)).cast("long").as("n_active"))
      .orderBy("cohort_day", "days_since")
  }

  /** Mergeable histogram quantiles — the quantile analogue of
    * [[qHllMerge]]: per-group FIXED-WIDTH integer histograms are the
    * stored partials, and any coarser scope derives its quantiles by
    * summing bin counts — never re-touching raw rows. Here the `ALL` row
    * is computed ONLY from the per-type partials (one ≤129-bin frame per
    * group), exactly how a 100 TB deployment keeps per-day histogram
    * state (129 longs/day/group) and answers any date-range p50/p95 in
    * O(days × bins) instead of a raw re-scan. `percentile` (exact,
    * [[qPercentiles]]) sorts within groups; `approx_percentile`
    * (q_agg_approx) sketches but its buffer is opaque to storage — the
    * explicit histogram is the form that persists and merges.
    *
    * Everything is integer-exact and engine-portable: values milli-
    * quantize via the proven `round(v*1000)` pattern (Sequence.scala),
    * bin width `W = (max-min) div 128 + 1` and bucket `(vi-mn) div W`
    * are non-negative BIGINT floor divisions, and the rank rule
    * `first bucket with 2·cum ≥ total` (p50) / `20·cum ≥ 19·total`
    * (p95) avoids any fractional arithmetic. The two scalars (mn, W)
    * are one model-sized driver row, like every sketch fit. */
  val qHistQuantile: QueryDef = QueryDef.sql(
    "q_hist_quantile",
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS vi FROM events
      |),
      |b AS (
      |  SELECT min(vi) AS mn,
      |         greatest((max(vi) - min(vi)) // 128 + 1, 1) AS w
      |  FROM v
      |),
      |part AS (
      |  SELECT event_type AS grp,
      |         (vi - (SELECT mn FROM b)) // (SELECT w FROM b) AS bucket,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM v GROUP BY 1, 2
      |),
      |merged AS (
      |  SELECT 'ALL' AS grp, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM part GROUP BY 2
      |),
      |u AS (
      |  SELECT grp, bucket, cnt FROM part
      |  UNION ALL
      |  SELECT grp, bucket, cnt FROM merged
      |),
      |c AS (
      |  SELECT grp, bucket,
      |         CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS BIGINT) AS cum,
      |         CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS total
      |  FROM u
      |)
      |SELECT grp,
      |       (SELECT mn FROM b) + (SELECT w FROM b) *
      |         min(CASE WHEN 2 * cum >= total THEN bucket END) AS p50_lo,
      |       (SELECT mn FROM b) + (SELECT w FROM b) *
      |         min(CASE WHEN 20 * cum >= 19 * total THEN bucket END) AS p95_lo
      |FROM c GROUP BY grp ORDER BY grp""".stripMargin) { (s, d) =>
    val v = Tables.events(s, d)
      .select(col("event_type"), round(col("value") * 1000).cast("long").as("vi"))
    // bin spec (mn, w) derived ONCE per source fingerprint — a production
    // histogram MV fixes it at view registration (StreamHistQuantile takes
    // it as a creation-time parameter); recomputing per query would pay a
    // second full corpus scan before the partials pass
    val (mn, w) = graft.api.ModelCache.cached(
      s"histbins:${graft.api.ModelCache.fingerprint(d, "events")}") {
      val b = v.agg(min(col("vi")), max(col("vi"))).first()
      if (b.isNullAt(0)) (0L, 1L) // empty corpus: vacuous bin spec — no
      else {                      // buckets ever form, result stays empty
        val m = b.getLong(0)
        (m, math.max((b.getLong(1) - m) / 128 + 1, 1L))
      }
    }
    val partials = graft.Persisting.maybe(
      v.groupBy(col("event_type").as("grp"),
          expr(s"(vi - $mn) div $w").as("bucket"))
        .agg(count(lit(1)).as("cnt")))
    histQuantiles(partials, mn, w)
  }

  /** Quantiles from stored histogram partials `(grp, bucket, cnt)`: the
    * shared READ face of [[qHistQuantile]] and the incrementally
    * maintained stream state ([[graft.streaming.StreamHistQuantile]]).
    * Derives the `ALL` row by summing per-group bin counts — the merge
    * never touches raw rows. */
  private[graft] def histQuantiles(partials: org.apache.spark.sql.DataFrame,
      mn: Long, w: Long): org.apache.spark.sql.DataFrame = {
    // the rollup row is carried on an internal boolean flag, not on the
    // display name "ALL" — a real group whose key value is 'ALL' would
    // otherwise be unioned into the rollup's window partition and
    // double-count bins (corrupting both). With the flag the partitions
    // stay disjoint; a genuine 'ALL' group then merely shares the display
    // name in the output (GROUPING SETS-style ambiguity, not corruption).
    val merged = partials.groupBy("bucket")
      .agg(sum(col("cnt")).as("cnt")).withColumn("grp", lit("ALL"))
      .withColumn("__rollup", lit(true))
      .select("grp", "__rollup", "bucket", "cnt")
    val grpW = org.apache.spark.sql.expressions.Window
      .partitionBy("grp", "__rollup")
    val cumed = partials.select("grp", "bucket", "cnt")
      .withColumn("__rollup", lit(false))
      .unionByName(merged)
      .withColumn("cum", sum(col("cnt")).over(grpW.orderBy("bucket")))
      .withColumn("total", sum(col("cnt")).over(grpW))
    cumed.groupBy("grp", "__rollup")
      .agg(
        (lit(mn) + lit(w) * min(when(col("cum") * 2 >= col("total"),
          col("bucket")))).as("p50_lo"),
        (lit(mn) + lit(w) * min(when(col("cum") * 20 >= col("total") * 19,
          col("bucket")))).as("p95_lo"))
      .select("grp", "p50_lo", "p95_lo")
      .orderBy("grp")
  }

  val all: Seq[QueryDef] = Seq(qWindowMedian, qArgmax, qCohort,
    qPivot, qAggCube, qPercentiles, qSampleStratified, qGapfill, qWindowDist,
    qCorrStats, qGroupedTopk, qHllMerge, qHistQuantile)
}
