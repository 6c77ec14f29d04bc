package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codec for the reference's fixed-width wire format.
  *
  * Layout (reference `DataStreamProcessingJob.java:47-64`, offsets are
  * character positions in the UTF-8-decoded string):
  *
  *   - `module`  `[0,16)`  left-aligned, space-padded, trimmed on read
  *   - `send_ts` `[16,32)` ASCII decimal epoch-millis, space-padded
  *   - reserved  `[32,64)` filler, never read
  *   - `tail`    `[64,…)`  opaque payload
  *
  * Everything here is a pure `Column` expression so the exact same code path
  * serves batch queries (DuckDB-verified) and the streaming pipeline
  * (`graft.streaming.MsgPipeline`) — batch/stream parity by construction.
  * All expressions are built-in (codegen'd, whole-stage-fusable); no UDFs.
  *
  * Divergence from the reference, by design: a malformed `send_ts` crashes
  * the reference task (`Long.parseLong`, `DataStreamProcessingJob.java:60`);
  * we use `try_cast` semantics (null on failure) so one bad record cannot
  * kill a 1000-executor job.
  */
object MsgCodec {
  val HeaderLen = 64
  val FieldLen  = 16

  /** Format `(module, sendTs, tail)` into one wire-format string.
    * Inverse of the parse_* extractors (round-trip property-tested). */
  def mkMsg(module: Column, sendTs: Column, tail: Column): Column =
    concat(
      rpad(module, FieldLen, " "),
      rpad(sendTs.cast("string"), FieldLen, " "),
      lit(" " * 32),
      tail)

  /** `module = trim(substr(value, 0, 16))` — reference `:53`. */
  def parseModule(value: Column): Column =
    trim(substring(value, 1, FieldLen))

  /** `send_ts = try_cast(trim(substr(value, 16, 32)) as long)` — ref `:59-60`.
    * Guarded cast (null on malformed) so it is safe under Spark 4 ANSI mode:
    * the reference would crash the task on `Long.parseLong` failure. */
  def parseSendTs(value: Column): Column = {
    val s = trim(substring(value, FieldLen + 1, FieldLen))
    when(s.rlike("^-?[0-9]{1,18}$"), s.cast("long"))
  }

  /** `tail = substr(value, 64)` — reference `:54`. */
  def parseTail(value: Column): Column =
    substring(value, HeaderLen + 1, Int.MaxValue)

  /** Guard: side outputs only consider messages longer than the header —
    * reference `:47-50`. */
  def guard(value: Column): Column = length(value) > HeaderLen

  /** Routing predicate: only `module == "session"` flows on — ref `:55`. */
  def isSession(module: Column): Column = module === "session"

  /** Delay metric vs. an explicit "now" in epoch-millis — reference `:58-61`
    * uses wall-clock `System.currentTimeMillis()`; the batch-verifiable form
    * takes the reference instant as a parameter (determinism contract,
    * SURVEY.md §2.B). */
  def delayMs(sendTs: Column, nowMs: Column): Column = nowMs - sendTs
}
