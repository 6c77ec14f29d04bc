package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` stream table (SURVEY.md
  * §2.B): ordered funnel conversion and rolling anomaly detection.
  *
  * Reference provenance: the reference routes events one at a time with no
  * cross-event state (DataStreamProcessingJob.java:42-64); sequence
  * analytics over the same event stream is new engine capability.
  *
  * Determinism: the funnel compares timestamps only (exact in both
  * engines); the anomaly detector runs entirely in BIGINT micro-units —
  * `value` is quantized to milli-units once, and the z-score test
  * `(x-μ)² > 9σ²` is cross-multiplied into pure integer arithmetic, so
  * there is no floating point anywhere and no engine can drift. Both run
  * overflow-checked (Spark ANSI, DuckDB always); bounds documented inline.
  */
object Sequence {

  /** Ordered funnel signup → click → purchase, 7-day total window.
    *
    * Each step is the EARLIEST qualifying event strictly after the prior
    * step — the standard funnel semantics (not mere presence of all three
    * types). Three conditional-min aggregations chained by equi-joins on
    * `user_id`; every join key is the grouping key, so at 100 TB the
    * per-step aggregates co-partition and the chain is one shuffle wide,
    * with each step's frame already reduced to ≤1 row per user before it
    * joins.
    */
  val qFunnel: QueryDef = QueryDef.sql(
    "q_funnel",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
      |),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |  GROUP BY e.user_id
      |),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |  GROUP BY e.user_id
      |)
      |SELECT s1.user_id, s1.t1 AS signup_ts, s2.t2 AS click_ts, s3.t3 AS purchase_ts
      |FROM s1 JOIN s2 ON s1.user_id = s2.user_id
      |        JOIN s3 ON s1.user_id = s3.user_id
      |WHERE s3.t3 <= s1.t1 + INTERVAL 7 DAY
      |ORDER BY s1.user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click").as("e")
      .join(s1.as("s1"), "user_id")
      .filter(col("e.ts") > col("t1"))
      .groupBy("user_id").agg(min(col("e.ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").as("e")
      .join(s2.as("s2"), "user_id")
      .filter(col("e.ts") > col("t2"))
      .groupBy("user_id").agg(min(col("e.ts")).as("t3"))
    s1.join(s2, "user_id").join(s3, "user_id")
      .filter(col("t3") <= col("t1") + expr("INTERVAL 7 DAY"))
      .select(col("user_id"), col("t1").as("signup_ts"),
        col("t2").as("click_ts"), col("t3").as("purchase_ts"))
      .orderBy("user_id")
  }

  /** Rolling z-score anomaly detection, exact integer arithmetic.
    *
    * Per user, ordered by (ts, event_id), each value is tested against the
    * mean/variance of the preceding 20 observations (needs ≥ 10). The
    * test `(x-μ)² > 9σ²` with μ = s1/n, σ² = (n·s2 − s1²)/(n·(n−1)) is
    * cross-multiplied to
    *   (n·x − s1)² · (n−1) > 9 · (n·s2 − s1²)
    * — all BIGINT on milli-quantized values. Bounds: x ≤ 5·10⁵ (value ≤
    * 490.02 → vi ≤ 490 020), n ≤ 20 ⇒ |n·x − s1| ≤ 2·10⁷, squared ≤
    * 4·10¹⁴, ×19 < 10¹⁶; n·s2 ≤ 20·20·(5·10⁵)² = 10¹⁴, ×9 < 10¹⁵ — both
    * far inside int64. The rolling window is one pass over a single
    * shuffle on user_id; at 100 TB this is the streaming-friendly shape
    * (same state as a watermarked per-key window).
    */
  val qAnomaly: QueryDef = QueryDef.sql(
    "q_anomaly",
    """WITH q AS (
      |  SELECT event_id, user_id, ts,
      |         CAST(round(value * 1000) AS BIGINT) AS vi
      |  FROM events
      |),
      |w AS (
      |  SELECT event_id, user_id, ts, vi,
      |         count(*)   OVER win AS n,
      |         sum(vi)    OVER win AS s1,
      |         sum(vi*vi) OVER win AS s2
      |  FROM q
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, ts,
      |       round(vi / 1000.0, 3) AS value,
      |       CAST(n AS BIGINT) AS n_baseline
      |FROM w
      |WHERE n >= 10
      |  AND (n*vi - s1)*(n*vi - s1)*(n - 1) > 9 * n * (n*s2 - s1*s1)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-20, -1)
    Tables.events(s, d)
      .withColumn("vi", round(col("value") * 1000).cast("long"))
      // vi² materialized BEFORE the window: all three rolling aggregates
      // then share ONE Window node (a windowed sum over an expression
      // forces Spark to split a second Window for the pre-projection)
      .withColumn("vi2", col("vi") * col("vi"))
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("s1", sum(col("vi")).over(win))
      .withColumn("s2", sum(col("vi2")).over(win))
      .filter(col("n") >= 10 &&
        (col("n") * col("vi") - col("s1")) * (col("n") * col("vi") - col("s1")) * (col("n") - 1) >
          lit(9) * col("n") * (col("n") * col("s2") - col("s1") * col("s1")))
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("vi") / 1000.0, 3).as("value"),
        col("n").as("n_baseline"))
      .orderBy("user_id", "event_id")
  }

  /** Last-observation-carried-forward imputation: sensor readings that
    * arrive as errors (here: `event_type = 'error'` masks the value)
    * repair from the user's most recent good reading — `last(...,
    * ignoreNulls)` over an unbounded-preceding frame, the standard LOCF
    * window. Values pass through UNCHANGED (no arithmetic), so parity is
    * exact; leading errors with no prior reading stay null, which the
    * output keeps visible via `was_imputed`. One shuffle on user_id. */
  val qLocf: QueryDef = QueryDef.sql(
    "q_locf",
    """WITH masked AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v_raw
      |  FROM events
      |)
      |SELECT event_id, user_id, ts,
      |       round(v_raw, 4) AS v_raw,
      |       round(last_value(v_raw IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_filled,
      |       (v_raw IS NULL) AS was_imputed
      |FROM masked
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("v_raw",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        round(col("v_raw"), 4).as("v_raw"),
        round(last(col("v_raw"), ignoreNulls = true).over(win), 4).as("v_filled"),
        col("v_raw").isNull.as("was_imputed"))
      .orderBy("user_id", "event_id")
  }

  /** Exponentially-weighted moving average, 16-tap truncation, exact
    * integer arithmetic: weight 2^(15−k) on the k-th most recent value,
    * denominator 2¹⁶−1 — the α=½ EWMA cut at 16 taps (remaining mass
    * < 2⁻¹⁶). True EWMA is an order-dependent float recursion no engine
    * pair replays bit-for-bit; power-of-two weights on milli-quantized
    * values make every partial sum exact, so the smoother is
    * deterministic in BOTH engines. Sixteen `lag`s share one Window node
    * (same frame), one shuffle on user_id; rows need all 16 predecessors.
    */
  val qEwma: QueryDef = QueryDef.sql(
    "q_ewma",
    ("""WITH q AS (
      |  SELECT event_id, user_id, ts,
      |         CAST(round(value * 1000) AS BIGINT) AS vi
      |  FROM events
      |)
      |SELECT event_id, user_id, ts,
      |       round(vi / 1000.0, 3) AS value,
      |       round((""" +
      (0 until 16).map(k =>
        s"lag(vi, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) * ${1L << (15 - k)}")
        .mkString(" +\n      |        ") +
      """) / 65535.0 / 1000.0, 4) AS ewma
      |FROM q
      |QUALIFY lag(vi, 15) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
      |ORDER BY user_id, event_id""").stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val weighted = (0 until 16).map(k => lag(col("vi"), k).over(w) * (1L << (15 - k)))
      .reduce(_ + _)
    Tables.events(s, d)
      .withColumn("vi", round(col("value") * 1000).cast("long"))
      .withColumn("wsum", weighted)
      .withColumn("oldest", lag(col("vi"), 15).over(w))
      .filter(col("oldest").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("vi") / 1000.0, 3).as("value"),
        round(col("wsum") / 65535.0 / 1000.0, 4).as("ewma"))
      .orderBy("user_id", "event_id")
  }

  val all: Seq[QueryDef] = Seq(qFunnel, qAnomaly, qLocf, qEwma)
}
