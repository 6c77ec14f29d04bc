package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's hot path (SURVEY.md §3.2) as batch queries over `events`:
  * format 64-char-header messages (R5/R12), guard (R7), fixed-width parse
  * (R8), route (R9), cast (R10), delay (R11), and the ZhiYan-style AVG
  * aggregate (R14). Reference: `DataStreamProcessingJob.java:41-66`.
  *
  * `events.event_type` has no literal "session", so the message generator
  * maps `purchase` → `session`; everything downstream then exercises the
  * real routing predicate.
  *
  * Scale note: this is a pure narrow pipeline (scan → project → filter)
  * until the final aggregate; Spark fuses it into one WholeStageCodegen
  * stage and the only shuffle is the map-side-combined groupBy — the same
  * shape the reference hand-tuned with operator chaining.
  */
object CodecQueries {

  /** Fixed "reference now" (2025-01-01T00:00:00Z) for the delay metric —
    * the batch-verifiable stand-in for `System.currentTimeMillis()` at
    * `DataStreamProcessingJob.java:58`. */
  val NowMs = 1735689600000L

  /** Wire-format messages synthesized from `events` (FIXTURES.md §A). */
  def rawMessages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      col("event_id"),
      MsgCodec.mkMsg(
        when(col("event_type") === "purchase", lit("session"))
          .otherwise(col("event_type")),
        unix_millis(col("ts")),
        col("props")).as("value"))
  }

  /** DuckDB CTE mirroring [[rawMessages]]. */
  val rawCte: String =
    """WITH raw AS (
      |  SELECT event_id,
      |         rpad(CASE WHEN event_type = 'purchase' THEN 'session' ELSE event_type END, 16, ' ') ||
      |         rpad(CAST(epoch_ms(ts) AS VARCHAR), 16, ' ') ||
      |         repeat(' ', 32) || props AS value
      |  FROM events
      |)""".stripMargin

  private def parsed(spark: SparkSession, dir: String): DataFrame =
    rawMessages(spark, dir).select(
      col("event_id"),
      col("value"),
      MsgCodec.parseModule(col("value")).as("module"),
      MsgCodec.parseSendTs(col("value")).as("send_ts"),
      MsgCodec.parseTail(col("value")).as("tail"))

  val qParseMsg: QueryDef = QueryDef.sql(
    "q_parse_msg",
    s"""$rawCte
       |SELECT event_id,
       |       trim(substr(value, 1, 16))                        AS module,
       |       CAST(trim(substr(value, 17, 16)) AS BIGINT)       AS send_ts,
       |       substr(value, 65)                                 AS tail
       |FROM raw
       |ORDER BY event_id""".stripMargin) { (s, d) =>
    parsed(s, d)
      .select("event_id", "module", "send_ts", "tail")
      .orderBy("event_id")
  }

  val qFilterGuard: QueryDef = QueryDef.sql(
    "q_filter_guard",
    s"""$rawCte
       |SELECT event_id, trim(substr(value, 1, 16)) AS module, CAST(length(value) AS INTEGER) AS msg_len
       |FROM raw
       |WHERE length(value) > 64 AND trim(substr(value, 1, 16)) = 'session'
       |ORDER BY event_id""".stripMargin) { (s, d) =>
    rawMessages(s, d)
      .where(MsgCodec.guard(col("value")))
      .select(
        col("event_id"),
        MsgCodec.parseModule(col("value")).as("module"),
        length(col("value")).as("msg_len"))
      .where(MsgCodec.isSession(col("module")))
      .orderBy("event_id")
  }

  /** Flagship (§7.1): the full hot path ending in the ZhiYan-style AVG —
    * guard → parse → route → delay → per-day aggregate. */
  val qParseRouteDelay: QueryDef = QueryDef.sql(
    "q_parse_route_delay",
    s"""$rawCte,
       |parsed AS (
       |  SELECT trim(substr(value, 1, 16)) AS module,
       |         CAST(trim(substr(value, 17, 16)) AS BIGINT) AS send_ts
       |  FROM raw WHERE length(value) > 64
       |)
       |SELECT send_ts // 86400000 AS day,
       |       count(*) AS cnt,
       |       round(CAST($NowMs - min(send_ts) AS DOUBLE) / 1000, 4) AS max_delay_s,
       |       round(CAST($NowMs - max(send_ts) AS DOUBLE) / 1000, 4) AS min_delay_s,
       |       round(CAST(sum($NowMs - send_ts) AS DOUBLE) / count(*) / 1000, 4) AS avg_delay_s
       |FROM parsed
       |WHERE module = 'session'
       |GROUP BY 1
       |ORDER BY day""".stripMargin) { (s, d) =>
    parsed(s, d)
      .where(MsgCodec.guard(col("value")) && MsgCodec.isSession(col("module")))
      .select(
        col("send_ts"),
        MsgCodec.delayMs(col("send_ts"), lit(NowMs)).as("delay_ms"))
      .groupBy(expr("send_ts div 86400000").as("day"))
      .agg(
        count(lit(1)).as("cnt"),
        round(max(col("delay_ms")).cast("double") / 1000, 4).as("max_delay_s"),
        round(min(col("delay_ms")).cast("double") / 1000, 4).as("min_delay_s"),
        round(sum(col("delay_ms")).cast("double") / count(lit(1)) / 1000, 4).as("avg_delay_s"))
      .orderBy("day")
  }

  /** Dead-letter routing: the production answer to the reference's
    * crash-on-malformed behavior (`Long.parseLong` throws out of
    * `processElement`, `DataStreamProcessingJob.java:59-60`, failing the
    * whole task). Messages are deterministically corrupted (every 23rd
    * truncated below the 64-byte header, every 17th gets a non-numeric
    * send_ts), then routed: short frames and unparseable timestamps land
    * in a quarantine channel WITH a reason, clean rows flow on — one
    * narrow pass, no exceptions anywhere (`try_cast`). The guard order
    * matches the reference: length first, then the timestamp field. */
  val qQuarantine: QueryDef = QueryDef.sql(
    "q_quarantine",
    s"""$rawCte,
       |corrupted AS (
       |  SELECT event_id,
       |         CASE WHEN event_id % 23 = 0 THEN substr(value, 1, 40)
       |              WHEN event_id % 17 = 0 THEN
       |                substr(value, 1, 16) || rpad('XX', 16, ' ') || substr(value, 33)
       |              ELSE value END AS value
       |  FROM raw
       |),
       |routed AS (
       |  SELECT event_id,
       |         CASE WHEN length(value) <= 64 THEN 'short_frame'
       |              WHEN TRY_CAST(trim(substr(value, 17, 16)) AS BIGINT) IS NULL THEN 'bad_send_ts'
       |              ELSE 'ok' END AS reason
       |  FROM corrupted
       |)
       |SELECT event_id, reason FROM routed
       |WHERE reason <> 'ok'
       |ORDER BY event_id""".stripMargin) { (s, d) =>
    val corrupted = rawMessages(s, d).select(
      col("event_id"),
      when(col("event_id") % 23 === 0, substring(col("value"), 1, 40))
        .when(col("event_id") % 17 === 0,
          concat(substring(col("value"), 1, 16), rpad(lit("XX"), 16, " "),
            expr("substr(value, 33)")))
        .otherwise(col("value")).as("value"))
    corrupted.select(
        col("event_id"),
        when(length(col("value")) <= 64, "short_frame")
          .when(expr("TRY_CAST(trim(substr(value, 17, 16)) AS BIGINT)").isNull, "bad_send_ts")
          .otherwise("ok").as("reason"))
      .filter(col("reason") =!= "ok")
      .orderBy("event_id")
  }

  val all: Seq[QueryDef] = Seq(qParseMsg, qFilterGuard, qParseRouteDelay, qQuarantine)
}
