package graft.operators

import graft.{QueryDef, Tables}
import graft.api.Layout
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Physical-layout operators as oracle-gated queries (SURVEY.md §2.B).
  * The clustering effectiveness proof (z-order files bound BOTH key
  * dimensions; single-column sort bounds one) lives in `LayoutSpec`; here
  * the Morton computation itself hash-verifies bit-for-bit.
  */
object LayoutOps {

  /** Morton z-values over (l_partkey, l_suppkey): the clustering key an
    * OPTIMIZE ZORDER write sorts by. First 500 cells of the curve. */
  val qZorder: QueryDef = QueryDef.sql(
    "q_zorder",
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |       CAST(${Layout.zValue2Sql("l_partkey", "l_suppkey")} AS BIGINT) AS z
       |FROM lineitem
       |ORDER BY z, l_orderkey, l_linenumber LIMIT 500""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        Layout.zValue2(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      .limit(500)
  }

  private def stateRoot(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-layout/${graft.api.ModelCache.sha16(d)}"

  /** Source-data fingerprint for build-once layout caching: path + file
    * sizes + mtimes of the tables a layout derives from. If the driver
    * regenerates testdata the fingerprint moves, so a stale layout from an
    * earlier generation can never serve a query (it gets a new name and is
    * rebuilt). Used for cache KEYING only — never in results. */
  private def fingerprint(d: String, tables: String*): String =
    graft.api.ModelCache.fingerprint(d, tables: _*)

  /** Layouts already built by THIS process (catalog registrations die with
    * the session, so a new JVM rebuilds — mode `overwrite` makes that
    * safe). Lets the recurring-query cost of a write-once layout show up
    * as such: bench attempt 1 prices build+query, steady state prices the
    * query alone — exactly the amortization a production deployment gets. */
  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Co-located (sort-merge-bucket) join end-to-end: write `orders` and
    * `lineitem` as bucketed+sorted tables on the join key, then run the
    * recurring fact-fact join. The fn THROWS unless the planned join is a
    * sort-merge join with ZERO shuffle exchanges under it — so this
    * oracle row gates the co-located path: DuckDB joins the plain parquet
    * and the hash-compare proves the bucket-routed answer identical.
    *
    * Scale rationale (100 TB): the dominant cost of a repeated fact-fact
    * join is shuffling both sides on the key — every query, all data.
    * Bucketing pays that exchange ONCE at write time; every subsequent
    * join reads co-located buckets with no exchange on either side. The
    * build is write-once per source-data fingerprint (see [[built]]): the
    * first run prices build+join, every later run prices the recurring
    * join alone — the amortization that justifies bucketing.
    * The `merge` hint (not a session-conf flip) keeps the proof stable
    * under AQE re-planning: the plan property must hold at execution
    * time, not just when this fn ran. */
  val qSmbJoin: QueryDef = QueryDef.sql(
    "q_smb_join",
    """SELECT o_orderpriority,
      |       count(*) AS cnt,
      |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val tag = fingerprint(d, "orders", "lineitem")
    val (ordersT, liT) = (s"orders_smb_$tag", s"lineitem_smb_$tag")
    // the catalog check covers a NEW SparkSession in the SAME process:
    // `built` outlives the in-memory catalog the tables register in, so
    // the fingerprint alone would skip the build and s.table() would fail
    if (!built.contains(tag) ||
        !s.catalog.tableExists(ordersT) || !s.catalog.tableExists(liT)) {
      Layout.writeBucketedAt(Tables.orders(s, d), ordersT,
        s"${stateRoot(d)}/orders_smb_$tag", "o_orderkey", buckets = 16)
      Layout.writeBucketedAt(Tables.lineitem(s, d), liT,
        s"${stateRoot(d)}/lineitem_smb_$tag", "l_orderkey", buckets = 16)
      built.add(tag)
    }
    val out = s.table(liT).hint("merge")
      .join(s.table(ordersT).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("l_quantity").cast("decimal(18,6)")).cast("double"), 2).as("sum_qty"))
      .orderBy("o_orderpriority")
    val smj = out.queryExecution.sparkPlan.collect { case j: SortMergeJoinExec => j }
    if (smj.isEmpty) throw new IllegalStateException(
      "q_smb_join: expected a sort-merge join over the bucketed tables")
    if (smj.exists(_.exists { case _: ShuffleExchangeLike => true; case _ => false }))
      throw new IllegalStateException(
        "q_smb_join: bucketed join still shuffles — co-location did not hold")
    out
  }

  /** Day-partitioned (`day=2024-01-01/...`) rewrite of `events`, built
    * once per source fingerprint and shared by both pruning rows below:
    * the recurring cost they price is the pruned READ; the partitioned
    * rewrite is the one-time layout build (a testdata regeneration moves
    * the fingerprint and rebuilds). */
  private def eventsByDay(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val dir = s"${stateRoot(d)}/events_by_day"
    val tag = fingerprint(d, "events") + "@events_by_day"
    if (!built.contains(tag) || !new java.io.File(dir).isDirectory) {
      Layout.writePartitioned(
        Tables.events(s, d)
          .withColumn("day", to_date(date_trunc("day", col("ts")))), dir, "day")
      built.add(tag)
    }
    dir
  }

  /** Static partition pruning end-to-end: read ONE day back from the
    * day-partitioned `events` rewrite. The fn THROWS unless the scan's
    * partition listing selected EXACTLY ONE directory — so this oracle
    * row gates directory-level pruning: DuckDB filters the flat parquet
    * and the hash-compare proves the pruned read identical.
    *
    * Scale rationale (100 TB): date-partitioning is the first-order scan
    * reducer on any fact stream — a one-day query against a 3-year table
    * must list and read 1/1000th of the directories, BEFORE any footer or
    * min/max work. The day is derived from the data (min ts), never from
    * the wall clock, so the row is deterministic across generations. The
    * one-row `first()` for that day is model-sized driver traffic. */
  val qPartitionPrune: QueryDef = QueryDef.sql(
    "q_partition_prune",
    """SELECT event_id, user_id, event_type, value,
      |       CAST(date_trunc('day', ts) AS DATE) AS day
      |FROM events
      |WHERE CAST(date_trunc('day', ts) AS DATE) =
      |      (SELECT CAST(min(date_trunc('day', ts)) AS DATE) FROM events)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val minRow = ev.agg(min(to_date(date_trunc("day", col("ts"))))).first()
    // empty events: no day exists, the partitioned rewrite has no files to
    // read and nothing to prune — an empty result (same schema), not a
    // crash, is the contract for an empty partition (DegenerateInputSpec)
    if (minRow.isNullAt(0)) {
      ev.withColumn("day", to_date(date_trunc("day", col("ts"))))
        .select("event_id", "user_id", "event_type", "value", "day")
        .where(lit(false))
    } else {
    val dir = eventsByDay(s, d)
    val minDay = minRow.getDate(0)
    val pruned = s.read.parquet(dir)
      .where(col("day") === lit(minDay))
      .select("event_id", "user_id", "event_type", "value", "day")
      .orderBy("event_id")
    val scanned = pruned.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f.selectedPartitions.partitionCount }
    if (!scanned.contains(1)) throw new IllegalStateException(
      s"q_partition_prune: expected exactly 1 partition scanned, got $scanned")
    pruned
    }
  }

  /** Dynamic partition pruning end-to-end: the star-schema shape a static
    * filter can't prune. The fact side is the day-partitioned `events`
    * rewrite; the dimension is a calendar frame (distinct days) filtered
    * on an ATTRIBUTE (`dayofmonth(day) % 5`), so no literal day predicate
    * ever touches the fact scan — the only way the fact read can skip
    * directories is Spark's `PartitionPruning` rule turning the dim-side
    * filter into a runtime `DynamicPruningSubquery` on the partition
    * column. The fn THROWS unless that subquery is present in the
    * optimized plan, and DuckDB replays the same join over the flat
    * parquet — so the hash-compare proves the runtime-pruned read
    * identical to the unpruned one.
    *
    * Scale rationale (100 TB): a fact-dim join "events × selected days"
    * is THE dominant warehouse access path, and the selected days are
    * usually known only at runtime (dim filter, not a literal). Static
    * pruning reads all 1000 days to join 6; DPP lists the dim first
    * (model-sized), then scans only matching directories — scan cost
    * tracks the dim selectivity, not table size. The mod-5 selector is
    * derived from the data's own min day, never the wall clock. */
  val qDppJoin: QueryDef = QueryDef.sql(
    "q_dpp_join",
    """WITH days AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
      |),
      |sel AS (
      |  SELECT day FROM days
      |  WHERE extract(day FROM day) % 5 =
      |        (SELECT extract(day FROM CAST(min(date_trunc('day', ts)) AS DATE)) % 5
      |         FROM events)
      |)
      |SELECT e.day, count(*) AS cnt,
      |       round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
      |FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value FROM events) e
      |JOIN sel ON sel.day = e.day
      |GROUP BY e.day
      |ORDER BY e.day""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    // the mod-5 anchor is one date off a min() aggregate — model-sized
    val minRow = ev.agg(min(to_date(date_trunc("day", col("ts"))))).first()
    // empty events: no anchor day, no partitioned files, nothing to prune
    // — return the empty aggregate shape (DegenerateInputSpec contract)
    if (minRow.isNullAt(0)) {
      ev.select(to_date(date_trunc("day", col("ts"))).as("day"), col("value"))
        .where(lit(false))
        .groupBy("day")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"))
        .orderBy("day")
    } else {
    val dir = eventsByDay(s, d)
    val minDom = minRow.getDate(0).toLocalDate.getDayOfMonth % 5
    val dim = ev.select(to_date(date_trunc("day", col("ts"))).as("day")).distinct()
      .where(dayofmonth(col("day")) % 5 === lit(minDom))
    val out = s.read.parquet(dir)
      .join(broadcast(dim), Seq("day"))
      .groupBy("day")
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"))
      .orderBy("day")
    val hasDpp = out.queryExecution.optimizedPlan.exists(p => p.expressions.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery => true
      case _ => false
    }))
    if (!hasDpp) throw new IllegalStateException(
      "q_dpp_join: expected a DynamicPruningSubquery on the partitioned fact scan")
    out
    }
  }

  val all: Seq[QueryDef] = Seq(qZorder, qSmbJoin, qPartitionPrune, qDppJoin)
}
