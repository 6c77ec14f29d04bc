package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal operators over the `events` stream (SURVEY.md §2.B): as-of
  * join, range (interval) join, and gap-based sessionization — the three
  * time-series shapes the reference's routing ETL implies but never
  * implements (its delay metric, `DelayInfoProcess.java:31-40`, is the
  * degenerate one-row case of an as-of lookup).
  *
  * Scale design — each avoids the naive quadratic/broadcast-nested-loop
  * formulation:
  *
  *   - **as-of join**: NOT a `ts <= ts` theta-join (BNLJ at any scale).
  *     Both sides union into one relation tagged left/right, then a single
  *     window pass per key carries the latest right-side row forward
  *     (`last(..., ignoreNulls)` over rows-unbounded-preceding). One
  *     shuffle on the key, linear scan within partitions — the same plan
  *     shape at 100 TB, and AQE-free deterministic.
  *   - **range join**: the inequality `a.ts ∈ [e.ts - 1h, e.ts)` becomes an
  *     equi-join on (user, hour-bucket) with the probe side exploded to its
  *     two candidate buckets, then an exact residual filter. Candidate set
  *     is O(rows-per-bucket), never the cross product; Catalyst plans a
  *     plain shuffle hash/sort-merge join on the composite key.
  *   - **sessionize**: lag + cumulative-sum over one (user, ts) window —
  *     the batch mirror of `StatefulOps.sessionWindows` (streaming session
  *     windows), one shuffle on user_id.
  *
  * Timestamps compare in microseconds (`unix_micros` / DuckDB `epoch_us`)
  * so both engines diff the identical integers — no float time math.
  */
object Temporal {

  /** 30-minute session gap, in microseconds. */
  private val GapUs = 30L * 60 * 1000000

  private val HourUs = 3600L * 1000000

  /** As-of join: each purchase picks the user's most recent click at or
    * before it (tie on ts broken toward the click, then highest event_id).
    * Purchases with no preceding click keep nulls — left-outer as-of. */
  val qAsofJoin: QueryDef = QueryDef.sql(
    "q_asof_join",
    """WITH u AS (
      |  SELECT event_id, ts, user_id, value,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
      |  FROM events
      |  WHERE event_type IN ('click', 'purchase')
      |),
      |w AS (
      |  SELECT event_id, ts, user_id, value, isp,
      |         last_value(CASE WHEN isp = 0 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
      |         last_value(CASE WHEN isp = 0 THEN ts END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
      |  FROM u
      |)
      |SELECT event_id AS purchase_id, user_id, ts, click_id, click_ts,
      |       epoch_us(ts) - epoch_us(click_ts) AS wait_us
      |FROM w WHERE isp = 1
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .withColumn("isp", when(col("event_type") === "purchase", 1).otherwise(0))
    // clicks sort before purchases at the same ts, so `ts <= purchase.ts`
    // (inclusive as-of) holds; among clicks the last row is the greatest
    // (ts, event_id) — the deterministic pick.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("isp"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("click_id",
        last(when(col("isp") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("isp") === 0, col("ts")), ignoreNulls = true).over(w))
      .where(col("isp") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        col("click_id"), col("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("wait_us"))
      .orderBy("purchase_id")
  }

  /** Range join: per error event, how many click/view events the same user
    * produced in the preceding hour `[e.ts - 1h, e.ts)`. The inequality is
    * bucketized: activities key on their hour bucket, errors probe bucket
    * and bucket-1, and the exact bound is a residual filter — so the join
    * is an equi-join on (user_id, bucket). Inner semantics: errors with no
    * preceding activity don't appear (matches the oracle's plain join). */
  val qRangeJoin: QueryDef = QueryDef.sql(
    "q_range_join",
    """SELECT e.event_id AS eid, count(*) AS n_prior
      |FROM events e
      |JOIN events a ON a.user_id = e.user_id
      |  AND a.event_type IN ('click', 'view')
      |  AND epoch_us(a.ts) >= epoch_us(e.ts) - 3600000000
      |  AND epoch_us(a.ts) <  epoch_us(e.ts)
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id
      |ORDER BY eid""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("ets"))
      .withColumn("eb", explode(array(
        expr(s"ets div $HourUs") - 1, expr(s"ets div $HourUs"))))
    val acts = ev.where(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_micros(col("ts")).as("ats"))
      .withColumn("ab", expr(s"ats div $HourUs"))
    errors.join(acts,
        col("uid") === col("user_id") && col("eb") === col("ab") &&
          col("ats") >= col("ets") - HourUs && col("ats") < col("ets"))
      .groupBy("eid").agg(count(lit(1)).as("n_prior"))
      .orderBy("eid")
  }

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 min. Emits one row per session with bounds and event count —
    * the batch analog of streaming session windows. */
  val qSessionize: QueryDef = QueryDef.sql(
    "q_sessionize",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > 1800000000 THEN 1
      |              WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                IS NULL THEN 1
      |              ELSE 0 END AS new_s
      |  FROM events
      |),
      |s AS (
      |  SELECT user_id, ts,
      |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM g
      |)
      |SELECT user_id, session_seq,
      |       min(ts) AS session_start, max(ts) AS session_end,
      |       count(*) AS n_events
      |FROM s
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    Tables.events(s, d)
      .withColumn("new_s", when(gapUs.isNull || gapUs > GapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_seq")
  }

  /** Forward as-of join — the mirror of [[qAsofJoin]]: each click matches
    * the EARLIEST purchase strictly after it (time-to-conversion, the
    * "next event" direction backward as-of can't express). Same single
    * window pass over the unioned stream, with a FOLLOWING frame and
    * `first(..., ignoreNulls)`; purchases sort before clicks at equal ts
    * so strictness holds, and clicks with no later purchase keep nulls.
    */
  val qAsofForward: QueryDef = QueryDef.sql(
    "q_asof_forward",
    """WITH u AS (
      |  SELECT event_id, ts, user_id,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
      |  FROM events
      |  WHERE event_type IN ('click', 'purchase')
      |),
      |w AS (
      |  SELECT event_id, ts, user_id, isp,
      |         first_value(CASE WHEN isp = 1 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp DESC, event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS purchase_id,
      |         first_value(CASE WHEN isp = 1 THEN ts END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp DESC, event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS purchase_ts
      |  FROM u
      |)
      |SELECT event_id AS click_id, user_id, ts, purchase_id, purchase_ts,
      |       epoch_us(purchase_ts) - epoch_us(ts) AS wait_us
      |FROM w WHERE isp = 0
      |ORDER BY click_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .withColumn("isp", when(col("event_type") === "purchase", 1).otherwise(0))
    // purchases sort BEFORE clicks at equal ts (isp DESC), so the
    // 1-FOLLOWING frame sees only strictly-later purchases for a click at
    // the same timestamp; among purchases the first row is the smallest
    // (ts, event_id) — the deterministic pick.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("isp").desc, col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    e.withColumn("purchase_id",
        first(when(col("isp") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("purchase_ts",
        first(when(col("isp") === 1, col("ts")), ignoreNulls = true).over(w))
      .where(col("isp") === 0)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
        col("purchase_id"), col("purchase_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("ts"))).as("wait_us"))
      .orderBy("click_id")
  }

  /** Nearest-direction as-of join (pandas `merge_asof` direction=nearest):
    * each purchase picks the click minimizing |Δt|, ties toward the
    * BACKWARD candidate (the only replay-safe choice — at a tie the
    * backward row was already observable). Same single-shuffle union
    * trick as [[qAsofJoin]]: one sort serves two frames — carry-forward
    * (last preceding click) and carry-backward (first following click) —
    * then a narrow argmin projection picks per row. No theta-join, no
    * second shuffle, frames O(1) per row. */
  val qAsofNearest: QueryDef = QueryDef.sql(
    "q_asof_nearest",
    """WITH u AS (
      |  SELECT event_id, ts, user_id,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
      |  FROM events
      |  WHERE event_type IN ('click', 'purchase')
      |),
      |w AS (
      |  SELECT event_id, ts, user_id, isp,
      |         last_value(CASE WHEN isp = 0 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_id,
      |         last_value(CASE WHEN isp = 0 THEN ts END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
      |         first_value(CASE WHEN isp = 0 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_id,
      |         first_value(CASE WHEN isp = 0 THEN ts END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
      |  FROM u
      |)
      |SELECT event_id AS purchase_id, user_id, ts,
      |       CASE WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL
      |                  OR epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts))
      |            THEN back_id ELSE fwd_id END AS nearest_id,
      |       CASE WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL
      |                  OR epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts))
      |            THEN epoch_us(ts) - epoch_us(back_ts)
      |            ELSE epoch_us(fwd_ts) - epoch_us(ts) END AS dt_us,
      |       CASE WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL
      |                  OR epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts))
      |            THEN 'B' ELSE 'F' END AS direction
      |FROM w WHERE isp = 1
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .withColumn("isp", when(col("event_type") === "purchase", 1).otherwise(0))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("isp"), col("event_id"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val clickId = when(col("isp") === 0, col("event_id"))
    val clickTs = when(col("isp") === 0, col("ts"))
    val w = e
      .withColumn("back_id", last(clickId, ignoreNulls = true).over(back))
      .withColumn("back_ts", last(clickTs, ignoreNulls = true).over(back))
      .withColumn("fwd_id", first(clickId, ignoreNulls = true).over(fwd))
      .withColumn("fwd_ts", first(clickTs, ignoreNulls = true).over(fwd))
      .where(col("isp") === 1)
    val backDt = unix_micros(col("ts")) - unix_micros(col("back_ts"))
    val fwdDt = unix_micros(col("fwd_ts")) - unix_micros(col("ts"))
    val takeBack = col("back_ts").isNotNull &&
      (col("fwd_ts").isNull || backDt <= fwdDt)
    w.select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        when(takeBack, col("back_id")).otherwise(col("fwd_id")).as("nearest_id"),
        when(takeBack, backDt).otherwise(fwdDt).as("dt_us"),
        when(takeBack, lit("B")).otherwise(lit("F")).as("direction"))
      .orderBy("purchase_id")
  }

  /** Hopping (sliding) window aggregate: 1-hour windows every 15 minutes
    * over the events stream — the batch face of the streaming
    * `window(ts, len, slide)` aggregate (each event replicates into
    * window/slide = 4 overlapping windows). Spark's `window()` generates
    * the 4 window assignments in the scan-stage Expand; the only exchange
    * is the map-side-combined (window, event_type) aggregate. The oracle
    * replays the same assignment arithmetic: window starts are
    * (floor(es/900) - j)·900 for j ∈ [0,4), which every event satisfies
    * exactly ([start, start+3600) is left-closed).
    *
    * Scale: replication factor is the fixed window/slide ratio, partials
    * are (window, type)-keyed — state ∝ windows in range, not rows.
    *
    * Oracle caveat: `es // 900` (DuckDB floor division) matches Spark's
    * window alignment only for ts >= epoch — a negative epoch would need
    * floor semantics on BOTH sides, and Spark's `window()` floors while
    * `epoch_us // 1000000` on a negative value still floors in DuckDB, but
    * the `- j` hop enumeration was only validated on positive epochs. The
    * driver's events data is all post-2024; TemporalSpec pins a
    * min(ts) >= epoch guard so a future testdata generation with pre-1970
    * rows fails loudly instead of diverging silently. */
  val qHopWindow: QueryDef = QueryDef.sql(
    "q_hop_window",
    """WITH e AS (
      |  SELECT epoch_us(ts) // 1000000 AS es, event_type, value FROM events
      |),
      |h AS (SELECT es, event_type, value, unnest(range(0, 4)) AS j FROM e),
      |w AS (SELECT make_timestamp((es // 900 - j) * 900 * 1000000) AS win_start,
      |             event_type, value
      |      FROM h)
      |SELECT win_start, event_type, count(*) AS cnt,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_v
      |FROM w GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)), 4)
          .as("avg_v"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("avg_v"))
      .orderBy("win_start", "event_type")
  }

  val all: Seq[QueryDef] = Seq(
    qAsofJoin, qRangeJoin, qSessionize, qAsofForward, qAsofNearest, qHopWindow)
}
