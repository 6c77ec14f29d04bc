package graft

import graft.operators.MsgCodec
import graft.streaming.MsgPipeline
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** FIXTURES.md §A cases 1–7 + round-trip property for the wire codec. */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  private def mk(module: String, sendTs: String, tail: String): String =
    module.padTo(16, ' ') + sendTs.padTo(16, ' ') + (" " * 32) + tail

  private def parseOne(msg: String): Option[Row] = {
    val out = MsgPipeline.parse(Seq(msg).toDF("value"))
      .select("module", "send_ts", "tail").collect()
    out.headOption
  }

  test("1. happy path: session msg parses and routes") {
    val r = parseOne(mk("session", "1700000000000", """{"a":1}""" + "\n")).get
    assert(r.getString(0) == "session")
    assert(r.getLong(1) == 1700000000000L)
    assert(r.getString(2) == """{"a":1}""" + "\n")
  }

  test("2. short message (len <= 64) dropped by guard") {
    assert(parseOne(mk("session", "1700000000000", "")).isEmpty)
  }

  test("3. non-session module excluded from session stream") {
    val parsed = MsgPipeline.parse(Seq(mk("heartbeat", "1700000000000", "x")).toDF("value"))
    assert(parsed.count() == 1) // parses fine
    assert(MsgPipeline.sessionStream(parsed).count() == 0) // but not routed
  }

  test("4. whitespace padding trimmed from module and send_ts") {
    val r = parseOne(mk("session        ", "  1700000000000", "x")).get
    assert(r.getString(0) == "session")
    assert(r.getLong(1) == 1700000000000L)
  }

  test("5. malformed send_ts -> null (reference crashes; documented divergence)") {
    val r = parseOne(mk("session", "12x4", "x")).get
    assert(r.isNullAt(1))
  }

  test("6. future send_ts -> negative delay, unclamped") {
    val parsed = MsgPipeline.parse(Seq(mk("session", "9999999999999", "x")).toDF("value"))
    val d = MsgPipeline.delayStream(parsed, nowMs = 1700000000000L)
      .select("delay_ms").as[Long].head()
    assert(d == 1700000000000L - 9999999999999L)
  }

  test("7. delay stream drops rows with unparseable send_ts") {
    val parsed = MsgPipeline.parse(Seq(
      mk("session", "12x4", "x"), mk("session", "1700000000000", "x")).toDF("value"))
    assert(MsgPipeline.delayStream(parsed, 1700000000001L).count() == 1)
  }

  test("round-trip: parse(format(m, ts, tail)) == (m, ts, tail)") {
    val modGen = Gen.oneOf("session", "heartbeat", "m", "abcdefghijklmnop")
    val tsGen = Gen.choose(0L, 4102444800000L)
    val tailGen = Gen.alphaNumStr.suchThat(_.nonEmpty)
    // generate one batch of cases, round-trip them all in one Spark job
    val cases = (for {
      seed <- 1 to 60
      m <- modGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      ts <- tsGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      tail <- tailGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
    } yield (m, ts, tail)).toSeq
    assert(cases.size > 30)
    val rows = cases.toDF("m", "ts", "tail")
      .select(col("m"), col("ts"), col("tail"),
        MsgCodec.mkMsg(col("m"), col("ts"), col("tail")).as("value"))
      .select(
        col("m"), col("ts"), col("tail"),
        MsgCodec.parseModule(col("value")).as("pm"),
        MsgCodec.parseSendTs(col("value")).as("pts"),
        MsgCodec.parseTail(col("value")).as("ptail"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("pm") == r.getAs[String]("m"))
      assert(r.getAs[Long]("pts") == r.getAs[Long]("ts"))
      assert(r.getAs[String]("ptail") == r.getAs[String]("tail"))
    }
  }
}
