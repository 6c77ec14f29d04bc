package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CodecQueries, MsgCodec}
import graft.sources.{MessageSource, MsgBroker}
import graft.streaming.MsgPipeline

/** Stateful-streaming throughput at REAL key counts
  * (`runMain graft.StreamStateScaleBench`).
  *
  * Why: the r14 state-store sizing fix (state_commit dominated by per-store
  * fixed cost → size `spark.sql.shuffle.partitions` to the state, not the
  * cores) was measured at SEVEN live window rows. The sizing rule
  * (#stores ≈ |live keys| / target) was asserted, not measured where it
  * matters. This bench holds ~10⁶ live keys — a per-key running aggregate
  * with no watermark eviction, the per-user-profile state shape — and
  * sweeps the store count {8, 32, 128}, recording throughput and the
  * state_profile phase attribution at each, so the rule is re-derived from
  * data.
  *
  * Key derivation: every published message embeds a distinct monotone
  * send_ts ([[StreamThroughputBench.publishMonotone]]), so
  * `xxhash64(value) mod nKeys` draws ~uniform keys over the full domain —
  * at the 2M-message default virtually every key of a 10⁶ domain goes
  * live by the end of the run. Per-batch execution times are recorded in
  * run order, so the artifact also shows whether batch cost stays flat as
  * the store grows from 0 to 10⁶ rows (it must: per-batch work is
  * O(changed keys), not O(|state|), with RocksDB changelog checkpointing).
  */
object StreamStateScaleBench {

  import StreamThroughputBench.{LegResult, publishMonotone, progressStats, statefulProfile}

  /** Per-key running aggregate leg: update-mode groupBy(k) with NO
    * watermark eviction — state rows grow to min(n, nKeys) by design. */
  def runKeyedLeg(spark: SparkSession, topics: Seq[String], n: Long,
      perTrigger: Long, ckpt: String, nKeys: Long, stores: Int): LegResult = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevChangelog = spark.conf.getOption(changelogKey)
    val prevParts = spark.conf.getOption(partsKey)
    graft.streaming.StatefulOps.useRocksDbStateStore(spark)
    spark.conf.set(changelogKey, "true")
    spark.conf.set(partsKey, stores.toString)
    try {
      val updated = new java.util.concurrent.atomic.LongAdder
      val src = MessageSource.brokerStream(spark, topics.mkString(","), Some(perTrigger))
      val keyed = MsgPipeline.parse(src)
        .where(MsgCodec.isSession(col("module")) && col("send_ts").isNotNull)
        .select(
          pmod(xxhash64(col("value")), lit(nKeys)).as("k"),
          MsgCodec.delayMs(col("send_ts"), lit(CodecQueries.NowMs)).as("delay_ms"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), avg("delay_ms").as("avg_delay"))
      val t0 = System.nanoTime()
      val q = keyed.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          updated.add(b.count()); () }
        .start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val (batches, engineRate, steady, batchMs) = progressStats(q)
      val profile = statefulProfile(q)
      q.stop()
      LegResult(s"keyed-$stores", n, wall, batches, engineRate, steady, batchMs,
        updated.sum(), 0L, profile)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
      prevChangelog match {
        case Some(p) => spark.conf.set(changelogKey, p)
        case None => spark.conf.unset(changelogKey)
      }
      prevParts match {
        case Some(p) => spark.conf.set(partsKey, p)
        case None => spark.conf.unset(partsKey)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load(args,
      defaults = GraftConfig.Default.copy(parallelism = 32))
    val n = sys.env.getOrElse("GRAFT_STREAM_MSGS", "2000000").toLong
    val nKeys = sys.env.getOrElse("GRAFT_STREAM_KEYS", "1000000").toLong
    val storeSweep = sys.env.getOrElse("GRAFT_STATE_SWEEP", "8,32,128")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Bench.tunedBuilder("graft-state-scale", cfg)
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Class.forName("org.apache.spark.sql.catalyst.util.CollationAwareUTF8String")

    val ckptBase = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"), "ssb-ckpt")
    java.nio.file.Files.createDirectories(ckptBase)
    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(ckptBase, tag).toString

    val base = CodecQueries.rawMessages(spark, cfg.sfDir)
      .select("value").collect().map(_.getString(0))
    require(base.nonEmpty, s"empty corpus from ${cfg.sfDir}")

    Bench.calibProbe(spark)
    val calibPre = Bench.calibrate(spark)

    // untimed warmup at a small n: JIT + RocksDB + plan
    val warmT = Seq("ssb-w0", "ssb-w1", "ssb-w2")
    publishMonotone(base, warmT, math.min(100000L, n), CodecQueries.NowMs)
    runKeyedLeg(spark, warmT, math.min(100000L, n),
      perTrigger = 25000L, ckpt = tmp("warm"), nKeys = nKeys, stores = 8)
    warmT.foreach(MsgBroker.remove)

    val perTrigger = sys.env.get("GRAFT_STREAM_TRIGGER").map(_.toLong)
      .getOrElse(math.max(n / 20, 1L))
    val legs = storeSweep.map { stores =>
      System.gc()
      val topics = Seq(s"ssb-$stores-0", s"ssb-$stores-1", s"ssb-$stores-2")
      publishMonotone(base, topics, n, CodecQueries.NowMs)
      val calibA = Bench.calibrate(spark)
      val r = runKeyedLeg(spark, topics, n, perTrigger, tmp(s"s$stores"),
        nKeys, stores)
      topics.foreach(MsgBroker.remove)
      println(s"[ssb] stores=$stores steady=${Bench.num(r.steadyRowsPerSec, 0)} " +
        s"rows/s calib=${Bench.num(calibA, 4)} profile=${r.stateProfile}")
      (stores, r, calibA)
    }
    val calibPost = Bench.calibrate(spark)

    import Bench.num
    // flatness: median batch ms of the first vs last third of the run —
    // a growing store must not grow per-batch cost (O(changed keys) work)
    def flatness(batchMs: Seq[Long]): (Long, Long) = {
      val b = batchMs.drop(1) // first batch pays one-time open costs
      if (b.size < 3) (0L, 0L)
      else {
        def med(xs: Seq[Long]) = { val s = xs.sorted; s(s.size / 2) }
        (med(b.take(b.size / 3)), med(b.takeRight(b.size / 3)))
      }
    }
    val legsJson = legs.map { case (stores, r, calibA) =>
      val (early, late) = flatness(r.batchMs)
      s"""    "$stores": {"steady_rows_per_sec": ${num(r.steadyRowsPerSec, 0)}, "wall_sec": ${num(r.wallSec, 2)}, "batches": ${r.batches}, "updated_rows": ${r.deliveredLines}, "batch_ms_median_early": $early, "batch_ms_median_late": $late, "calib_before": ${num(calibA, 4)}, "state_profile": ${r.stateProfile}}"""
    }.mkString(",\n")
    val best = legs.maxBy(_._2.steadyRowsPerSec)
    // the in-engine auto rule's choice for this workload (r16): changed
    // keys per batch are bounded above by the trigger's row cap — the
    // sweep verifies the auto choice matches the swept optimum
    val autoStores = graft.streaming.StatefulOps.statePartitionsFor(perTrigger)
    val doc = s"""{
  "n_msgs": $n,
  "n_keys": $nKeys,
  "sf": "${cfg.sfDir}",
  "calib_pre_sec": ${num(calibPre, 4)},
  "calib_post_sec": ${num(calibPost, 4)},
  "calib_ref_sec": ${num(Bench.CalibRef, 4)},
  "sweep_stores": [${storeSweep.mkString(", ")}],
  "legs": {
$legsJson
  },
  "auto_stores": $autoStores,
  "auto_matches_best": ${autoStores == best._1},
  "best_stores": ${best._1},
  "notes": "per-key running aggregate (update mode, no watermark eviction): live state grows to ~min(n_msgs, n_keys) rows; the r14 rule (#stores ~= |live keys|/target) is re-derived from this sweep at 10^6 keys"
}
"""
    val out = sys.env.getOrElse("GRAFT_STATE_SCALE_JSON", "bench_stream_keys_r18.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(s"""{"metric":"state_scale","best_stores":${best._1},"auto_stores":$autoStores,"best_steady":${num(best._2.steadyRowsPerSec, 0)},"n_keys":$nKeys,"calib_post":${num(calibPost, 4)}}""")
    spark.stop()
  }
}
