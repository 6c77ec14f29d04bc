package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational spine over the star schema (SURVEY.md §2.B): scans, joins
  * (broadcast / shuffle / semi / anti), aggregations, window functions,
  * top-k, set ops, string/date functions, JSON and array functions.
  *
  * The reference has none of these (it is a routing ETL job); they are the
  * engine's declared query surface, all pure `org.apache.spark.sql.functions`
  * so Catalyst handles pushdown/pruning/join selection and every operator
  * stays inside whole-stage codegen.
  *
  * Scale notes, per operator family:
  *   - dim joins (`region`/`nation`/`customer`-sized sides) are explicitly
  *     `broadcast()` — no shuffle of the fact table;
  *   - fact-fact joins shuffle on the join key once, and the following
  *     groupBy reuses that clustering where possible;
  *   - aggregates are map-side combined by Spark automatically; DECIMAL
  *     partial sums keep double results partition-order-independent;
  *   - top-k compiles to TakeOrderedAndProject (per-partition heap + driver
  *     merge of k rows, not a global sort).
  */
object Relational {

  /** Exact, order-independent sum of a double expression: through
    * DECIMAL(18,6). Deterministic across partitionings and engines. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)"))

  val qScanLineitem: QueryDef = QueryDef.sql(
    "q_scan_lineitem",
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_discount > 0.05
      |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin) { (s, d) =>
    // NB: (l_orderkey, l_linenumber) is NOT unique in this synthetic
    // lineitem; only the full quadruple is — every lineitem-keyed ORDER BY
    // must use it or row order is nondeterministic.
    Tables.lineitem(s, d)
      .where(col("l_shipdate") < lit("1995-06-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  }

  val qJoinBroadcast: QueryDef = QueryDef.sql(
    "q_join_broadcast",
    """SELECT r.r_name, n.n_name,
      |       count(*) AS n_cust,
      |       round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_bal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_cust"),
        round(dsum(col("c_acctbal")).cast("double"), 2).as("sum_bal"))
      .orderBy("r_name", "n_name")
  }

  val qJoinShuffle: QueryDef = QueryDef.sql(
    "q_join_shuffle",
    """SELECT o.o_orderstatus, o.o_orderpriority,
      |       count(*) AS n_items,
      |       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderstatus, o.o_orderpriority
      |ORDER BY o.o_orderstatus, o.o_orderpriority""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("double"), 2)
          .as("revenue"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Left-semi join — the reference's `module == "session"` routing
    * generalized to a routing table (SURVEY.md §2.B joins row). */
  val qJoinSemi: QueryDef = QueryDef.sql(
    "q_join_semi",
    """SELECT o_orderkey, o_totalprice
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(
        Tables.lineitem(s, d).where(col("l_quantity") >= 48),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val qJoinAnti: QueryDef = QueryDef.sql(
    "q_join_anti",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).where(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val qAggDelay: QueryDef = QueryDef.sql(
    "q_agg_delay",
    """SELECT event_type,
      |       count(*) AS cnt,
      |       round(min(value), 4) AS min_v,
      |       round(max(value), 4) AS max_v,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_v
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"),
        round(dsum(col("value")).cast("double"), 4).as("sum_v"),
        round(dsum(col("value")).cast("double") / count(lit(1)), 4).as("avg_v"))
      .orderBy("event_type")
  }

  val qAggDistinct: QueryDef = QueryDef.sql(
    "q_agg_distinct",
    """SELECT event_type,
      |       count(DISTINCT user_id) AS n_users,
      |       count(DISTINCT CAST(props->>'$.k' AS INTEGER)) AS n_keys
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k")).as("n_keys"))
      .orderBy("event_type")
  }

  /** ROLLUP with null group markers coalesced so NULLS FIRST/LAST defaults
    * cannot diverge between engines. */
  val qAggRollup: QueryDef = QueryDef.sql(
    "q_agg_rollup",
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      |       coalesce(o_orderpriority, '<all>') AS priority,
      |       count(*) AS cnt,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        round(dsum(col("o_totalprice")).cast("double"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("cnt"), col("total"))
      .orderBy("status", "priority")
  }

  /** Ranking windows: top-3 orders per customer by recency; rank over a
    * deterministic total order (unique tiebreak on o_orderkey). */
  val qWindowRank: QueryDef = QueryDef.sql(
    "q_window_rank",
    """SELECT o_custkey, o_orderkey, rn, price_rank, prio_dense, next_order
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS INTEGER) AS rn,
      |         CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank,
      |         CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INTEGER) AS prio_dense,
      |         lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS next_order
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byPrio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(byDate).as("rn"),
        rank().over(byPrice).as("price_rank"),
        dense_rank().over(byPrio).as("prio_dense"),
        lead(col("o_orderkey"), 1).over(byDate).as("next_order"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Frame-based running aggregate + lag: delay-trend analog over lineitem
    * (SURVEY.md §2.B window row). */
  val qWindowRunning: QueryDef = QueryDef.sql(
    "q_window_running",
    """SELECT l_suppkey, l_orderkey, l_partkey, l_linenumber,
      |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
      |             OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_partkey, l_linenumber
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_qty,
      |       lag(l_orderkey) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_partkey, l_linenumber) AS prev_order
      |FROM lineitem
      |WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_orderkey, l_partkey, l_linenumber""".stripMargin) { (s, d) =>
    // window order: (l_orderkey, l_partkey, l_linenumber) is unique within
    // an l_suppkey partition (full quadruple unique; suppkey is fixed)
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_partkey", "l_linenumber")
    Tables.lineitem(s, d)
      .where(col("l_suppkey") <= 20)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        round(
          sum(col("l_quantity").cast("decimal(18,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"), 2).as("running_qty"),
        lag(col("l_orderkey"), 1).over(w).as("prev_order"))
      .orderBy("l_suppkey", "l_orderkey", "l_partkey", "l_linenumber")
  }

  /** Top-k: plans as TakeOrderedAndProject — no global sort at scale. */
  val qTopk: QueryDef = QueryDef.sql(
    "q_topk",
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_partkey, l_suppkey, l_linenumber
      |LIMIT 100""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_linenumber"))
      .limit(100)
  }

  /** Set ops reassembling split streams (the dual of the reference's side
    * outputs, SURVEY.md §2.B): purchasers ∩ signups ∖ error-reporters. */
  val qUnion: QueryDef = QueryDef.sql(
    "q_union",
    """(SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
      |   FROM events WHERE event_type = 'purchase'
      | INTERSECT
      | SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
      |   FROM events WHERE event_type = 'signup')
      |EXCEPT
      |SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
      |  FROM events WHERE event_type = 'error'
      |ORDER BY user_id, day""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    def userDays(t: String) = ev.where(col("event_type") === t).select(
      col("user_id"),
      date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
    userDays("purchase").intersect(userDays("signup")).except(userDays("error"))
      .orderBy("user_id", "day")
  }

  /** Bag-semantics set operations — INTERSECT ALL keeps min multiplicity,
    * EXCEPT ALL subtracts multiplicities — over the part streams of two
    * lineitem slices. The ALL variants are what reconciliation pipelines
    * actually need (a part shipped 3× in one slice and 2× in the other
    * intersects 2×, not 1×); both engines plan them as counted
    * aggregations, no row-pairing join. */
  val qSetopsBag: QueryDef = QueryDef.sql(
    "q_setops_bag",
    """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
      |b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
      |ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
      |ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |SELECT 'intersect_all' AS op, l_partkey, count(*) AS n FROM ia GROUP BY l_partkey
      |UNION ALL
      |SELECT 'except_all', l_partkey, count(*) FROM ea GROUP BY l_partkey
      |ORDER BY op, l_partkey""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def slice(f: String) = li.where(col("l_returnflag") === f).select("l_partkey")
    val ia = slice("R").intersectAll(slice("A"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("l_partkey"), col("n"))
    val ea = slice("R").exceptAll(slice("A"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("l_partkey"), col("n"))
    ia.unionByName(ea).orderBy("op", "l_partkey")
  }

  val qStringDateFns: QueryDef = QueryDef.sql(
    "q_string_date_fns",
    """SELECT o_orderkey,
      |       upper(o_orderstatus) AS status_u,
      |       concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
      |       CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
      |       replace(o_orderpriority, '-', '_') AS prio_r,
      |       strftime(o_orderdate, '%Y-%m-%d') AS od,
      |       CAST(year(o_orderdate) AS INTEGER) AS oy,
      |       CAST(month(o_orderdate) AS INTEGER) AS om,
      |       round(CAST(o_totalprice * 1.07 AS DOUBLE), 2) AS taxed
      |FROM orders
      |WHERE o_orderkey % 7 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .where(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_u"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        length(col("o_orderpriority")).as("prio_len"),
        expr("replace(o_orderpriority, '-', '_')").as("prio_r"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        year(col("o_orderdate")).as("oy"),
        month(col("o_orderdate")).as("om"),
        round((col("o_totalprice") * 1.07).cast("double"), 2).as("taxed"))
      .orderBy("o_orderkey")
  }

  /** Batch analog of the streaming tumbling window: date_trunc bucketing
    * (SURVEY.md §2.B streaming-windows row). */
  val qDateTrunc: QueryDef = QueryDef.sql(
    "q_date_trunc",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       event_type,
      |       count(*) AS cnt,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(dsum(col("value")).cast("double"), 4).as("sum_v"))
      .orderBy("day", "event_type")
  }

  val qJsonExtract: QueryDef = QueryDef.sql(
    "q_json_extract",
    """SELECT CAST(props->>'$.k' AS INTEGER) % 10 AS k_bucket,
      |       count(*) AS cnt,
      |       count(DISTINCT user_id) AS n_users
      |FROM events
      |WHERE CAST(props->>'$.k' AS INTEGER) IS NOT NULL
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin) { (s, d) =>
    // from_json (schema'd, parser reused per partition) rather than
    // get_json_object (per-row parser through Jackson's ThreadLocal
    // recycler — profiled as a stall magnet at high row counts)
    Tables.events(s, d)
      .select(
        (from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k") % 10).as("k_bucket"),
        col("user_id"))
      .where(col("k_bucket").isNotNull)
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("k_bucket")
  }

  /** Schema-full JSON parse (`from_json` with explicit schema — not just
    * path extraction): typed struct access over events.props. */
  val qFromJson: QueryDef = QueryDef.sql(
    "q_from_json",
    """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
      |FROM events
      |WHERE event_id % 13 = 0
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .where(col("event_id") % 13 === 0)
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .orderBy("event_id")
  }

  /** Array functions over the embeddings column (SURVEY.md §2.B array row):
    * transform / aggregate / zip_with / array_sort / slice / min-max. */
  val qArrayFns: QueryDef = QueryDef.sql(
    "q_array_fns",
    """SELECT vec_id,
      |       CAST(len(embedding) AS INTEGER) AS dim,
      |       round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |             (acc, x) -> acc + x)), 4) AS l2_norm,
      |       round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_v,
      |       round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_v,
      |       list_sort(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)))[1] AS sorted_lo,
      |       list_sort(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)))[3] AS sorted_3rd,
      |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |             list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[65 - i] AS DOUBLE))),
      |             (acc, x) -> acc + x), 4) AS rev_dot
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val asMillis = transform(col("embedding"),
      x => round(x.cast("double") * 1000, 0).cast("long"))
    val dbl = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0),
          (acc, x) => acc + x)), 4).as("l2_norm"),
        round(array_max(col("embedding")).cast("double"), 4).as("max_v"),
        round(array_min(col("embedding")).cast("double"), 4).as("min_v"),
        element_at(slice(array_sort(asMillis), 1, 3), 1).as("sorted_lo"),
        element_at(slice(array_sort(asMillis), 1, 3), 3).as("sorted_3rd"),
        round(aggregate(zip_with(dbl, reverse(dbl), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x), 4).as("rev_dot"))
      .orderBy("vec_id")
  }

  /** Explicit GROUPING SETS (beyond rollup): disjoint grouping shapes in
    * one pass over orders. */
  val qGroupingSets: QueryDef = QueryDef.sql(
    "q_grouping_sets",
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      |       coalesce(o_orderpriority, '<all>') AS priority,
      |       count(*) AS cnt,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    // native Dataset.groupingSets (Spark 4) — same Column-API style as the
    // rest of the suite, no temp view / SQL string detour
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        round(dsum(col("o_totalprice")).cast("double"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("cnt"), col("total"))
      .orderBy("status", "priority")
  }

  /** Sketch aggregates (HLL distinct, quantile sketch): the scale path for
    * distinct-count/quantiles. Approximate by design, so the raw estimates
    * can't hash-match an exact engine — instead (q_hll_merge pattern,
    * round 8) the query emits the EXACT distinct count (oracle-recomputable)
    * plus error-bound booleans evaluated on the Spark side: the HLL
    * estimate within 5 % of exact, and each approx percentile's true rank
    * within its tolerance band (rank checks are robust to the sketch's
    * partition-merge-order nondeterminism, which is why the raw estimate
    * was never hashable). The oracle asserts the same booleans as literal
    * TRUE. Scale shape: two map-side-combined aggs over events plus one
    * broadcast join of the 5-row sketch frame back onto events. */
  val qAggApprox: QueryDef = QueryDef.sql(
    "q_agg_approx",
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
      |       true AS approx_users_ok, true AS p50_ok, true AS p99_ok
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val sketch = ev.groupBy("event_type").agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
      percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99a"))
    // true rank of each approx percentile: fraction of the group's values
    // at or below it — one broadcast join (sketch frame is group-count-sized)
    val ranks = ev.join(broadcast(sketch), "event_type")
      .groupBy("event_type")
      .agg(
        avg(when(col("value") <= col("p50a"), 1.0).otherwise(0.0)).as("frac50"),
        avg(when(col("value") <= col("p99a"), 1.0).otherwise(0.0)).as("frac99"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(broadcast(sketch), "event_type").join(broadcast(ranks), "event_type")
      .select(
        col("event_type"), col("n_exact"),
        (abs(col("approx_users") - col("n_exact")) <=
          col("n_exact") * 0.05).as("approx_users_ok"),
        col("frac50").between(0.45, 0.55).as("p50_ok"),
        col("frac99").between(0.97, 1.0).as("p99_ok"))
      .orderBy("event_type")
  }

  /** Second pushdown scan over a different table/type mix. */
  val qScanPart: QueryDef = QueryDef.sql(
    "q_scan_part",
    """SELECT p_partkey, p_brand, p_size, p_retailprice
      |FROM part
      |WHERE p_size >= 40 AND p_type LIKE '%M%'
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .where(col("p_size") >= 40 && col("p_type").like("%M%"))
      .select("p_partkey", "p_brand", "p_size", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** Full outer join over two sparse aggregates (size-filtered vs
    * key-sparse subsets): brands present on only one side survive with the
    * other side's metrics null (coalesced to 0 at the output boundary). Same single-shuffle scale shape as the inner
    * join — outer-ness changes emission, not movement. */
  val qJoinOuter: QueryDef = QueryDef.sql(
    "q_join_outer",
    """WITH big AS (
      |  SELECT p_brand, count(*) AS n_big FROM part WHERE p_size > 47 GROUP BY p_brand
      |),
      |sparse AS (
      |  SELECT p_brand, count(*) AS n_sparse FROM part WHERE p_partkey % 37 = 0 GROUP BY p_brand
      |)
      |SELECT coalesce(big.p_brand, sparse.p_brand) AS brand,
      |       coalesce(n_big, 0) AS n_big,
      |       coalesce(n_sparse, 0) AS n_sparse
      |FROM big FULL OUTER JOIN sparse ON big.p_brand = sparse.p_brand
      |ORDER BY brand""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d)
    val big = p.where(col("p_size") > 47)
      .groupBy(col("p_brand").as("bb")).agg(count(lit(1)).as("n_big"))
    val sparse = p.where(col("p_partkey") % 37 === 0)
      .groupBy(col("p_brand").as("pb")).agg(count(lit(1)).as("n_sparse"))
    big.join(sparse, col("bb") === col("pb"), "full_outer")
      .select(
        coalesce(col("bb"), col("pb")).as("brand"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("n_sparse"), lit(0L)).as("n_sparse"))
      .orderBy("brand")
  }

  /** Null-safe equi-join (`<=>` / `IS NOT DISTINCT FROM`): null keys MATCH
    * null keys instead of vanishing — the semantics needed when the join
    * key is legitimately optional. Planted nulls via `nullif`; still plans
    * as a hash join (null-safe equality is a valid equi-join key), so the
    * scale shape is identical to a plain equi-join. */
  val qJoinNullsafe: QueryDef = QueryDef.sql(
    "q_join_nullsafe",
    """WITH d AS (
      |  SELECT DISTINCT nullif(l_returnflag, 'N') AS k FROM lineitem
      |),
      |f AS (
      |  SELECT nullif(l_returnflag, 'N') AS fk, l_quantity FROM lineitem
      |)
      |SELECT coalesce(d.k, '<null>') AS key,
      |       count(*) AS n_rows,
      |       round(CAST(sum(CAST(f.l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty
      |FROM f JOIN d ON f.fk IS NOT DISTINCT FROM d.k
      |GROUP BY 1
      |ORDER BY key""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val dim = li.select(nullif(col("l_returnflag"), lit("N")).as("k")).distinct()
    val fact = li.select(
      nullif(col("l_returnflag"), lit("N")).as("fk"), col("l_quantity"))
    fact.join(dim, col("fk") <=> col("k"))
      .groupBy(coalesce(col("k"), lit("<null>")).as("key"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(dsum(col("l_quantity")).cast("double"), 2).as("sum_qty"))
      .orderBy("key")
  }

  /** Regex string functions: extract / replace-all / match. Patterns are
    * deliberately restricted to the POSIX-compatible subset (character
    * classes, groups, alternation, anchors) where Java's regex (Spark) and
    * RE2 (DuckDB, and most native engines) agree — backrefs/lookarounds
    * would be Java-only and are not declared surface. */
  val qRegexFns: QueryDef = QueryDef.sql(
    "q_regex_fns",
    """SELECT p_partkey,
      |       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num,
      |       regexp_replace(p_type, '[AEIOU]', '*', 'g') AS type_masked,
      |       regexp_matches(p_type, '^(ECONOMY|SMALL)') AS is_small_econ
      |FROM part
      |WHERE p_size > 45
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .where(col("p_size") > 45)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("int").as("brand_num"),
        regexp_replace(col("p_type"), "[AEIOU]", "*").as("type_masked"),
        col("p_type").rlike("^(ECONOMY|SMALL)").as("is_small_econ"))
      .orderBy("p_partkey")
  }

  /** Salted skew join ([[graft.api.Skew.saltedJoin]]): the fact side's hot
    * order keys spread over 8 salt buckets; results are provably identical
    * to the plain equi-join, which is exactly what the oracle checks. At
    * 100 TB this is the manual fallback for skew AQE can't split (e.g. the
    * dim side also hot-spots after replication). */
  val qJoinSkew: QueryDef = QueryDef.sql(
    "q_join_skew",
    """SELECT o.o_orderpriority,
      |       count(*) AS n_items,
      |       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"), col("l_discount"))
    val dim = Tables.orders(s, d)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.api.Skew.saltedJoin(fact, dim, key = "okey", buckets = 8)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("double"), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Two-phase (salted) aggregation ([[graft.api.Skew.twoPhaseAgg]]): a hot
    * group key reduces through 16 parallel partials before the final
    * per-key merge; decimal partial sums keep the result bit-identical to
    * the one-phase plan the oracle runs. */
  val qSkewAgg: QueryDef = QueryDef.sql(
    "q_skew_agg",
    """SELECT l_returnflag AS key,
      |       count(*) AS n_rows,
      |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY key""".stripMargin) { (s, d) =>
    graft.api.Skew.twoPhaseAgg(
      Tables.lineitem(s, d),
      key = col("l_returnflag"),
      buckets = 16,
      partial = Seq(count(lit(1)).as("c"), dsum(col("l_quantity")).as("q")),
      finalAgg = Seq(sum(col("c")).as("n_rows"),
        round(sum(col("q")).cast("double"), 2).as("sum_qty")))
      .orderBy("key")
  }

  /** Map functions (SURVEY.md §2.B array/map/json row, the map third):
    * build a per-customer status→count map from aggregated entries, then
    * read it back with element_at / map_keys / size. Entries are sorted
    * before `map_from_entries` so key order (and the joined key string)
    * is deterministic; lookups of absent keys are null, not errors. The
    * oracle computes the same values relationally (conditional max +
    * ordered string_agg) — the map is an access-path choice, the results
    * must not depend on it. */
  val qMapFns: QueryDef = QueryDef.sql(
    "q_map_fns",
    """WITH s AS (
      |  SELECT o_custkey, o_orderstatus AS st, CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT o_custkey,
      |       max(CASE WHEN st = 'O' THEN cnt END) AS n_open,
      |       max(CASE WHEN st = 'F' THEN cnt END) AS n_finished,
      |       CAST(count(*) AS INTEGER) AS n_statuses,
      |       string_agg(st, ',' ORDER BY st) AS statuses
      |FROM s GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      // a null status cannot be a map key (NULL_MAP_KEY) — excluded in the
      // oracle identically, so both engines agree on any data
      .where(col("o_orderstatus").isNotNull)
      .groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("o_custkey"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("o_orderstatus"), col("cnt"))))).as("m"))
      .select(
        col("o_custkey"),
        element_at(col("m"), "O").as("n_open"),
        element_at(col("m"), "F").as("n_finished"),
        size(col("m")).as("n_statuses"),
        array_join(map_keys(col("m")), ",").as("statuses"))
      .orderBy("o_custkey")
  }

  /** UNPIVOT / melt: lineitem measure columns into (metric, value) rows —
    * the wide→long reshape a feature pipeline uses before per-metric
    * aggregation. Narrow: one scan, rows × metrics output, no shuffle
    * until the consumer aggregates. Oracle is the equivalent UNION ALL
    * (values pass through untouched, so raw doubles compare exactly). */
  val qUnpivot: QueryDef = QueryDef.sql(
    "q_unpivot",
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem
      |)
      |WHERE l_orderkey % 50 = 0
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_orderkey") % 50 === 0)
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        variableColumnName = "metric",
        valueColumnName = "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")
  }

  val all: Seq[QueryDef] = Seq(
    qScanLineitem, qScanPart, qJoinBroadcast, qJoinShuffle, qJoinSemi, qJoinAnti,
    qJoinNullsafe, qJoinOuter, qJoinSkew, qSkewAgg,
    qAggDelay, qAggDistinct, qAggRollup, qGroupingSets, qAggApprox,
    qWindowRank, qWindowRunning,
    qTopk, qUnion, qSetopsBag, qStringDateFns, qDateTrunc, qJsonExtract, qFromJson,
    qArrayFns, qMapFns, qUnpivot, qRegexFns)
}
