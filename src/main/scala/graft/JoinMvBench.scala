package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-step cost of JOIN-view incremental maintenance WITH vs WITHOUT
  * history compaction (`runMain graft.JoinMvBench`) — the measurement
  * behind [[graft.api.IncrementalJoinAgg.compactHistory]].
  *
  * The q_mv_join view (orders ⋈ customer partials) is advanced through
  * `Batches` aligned delta waves on two fresh state roots in ONE process
  * (host-window-immune comparison):
  *
  *   - `plain`: deltas only — by step N the history read unions N
  *     directories per side, the accumulation anti-pattern the r16
  *     verdict flagged (O(batches) listings/opens per step, forever);
  *   - `compacted`: identical waves, with `compactHistory` after
  *     `CompactAt` — the tail steps read ONE key-clustered segment
  *     (+ the few post-compact deltas) per side.
  *
  * Output: per-step apply seconds for both legs, the tail-step mean
  * ratio, live-directory counts at the end, and a parity check (both
  * roots' final partials must be identical — compaction is layout-only).
  */
object JoinMvBench {

  private val Batches =
    sys.env.get("GRAFT_JOINMV_BATCHES").flatMap(_.toIntOption).getOrElse(24)
  private val CompactAt = Batches * 2 / 3 - 1 // compact after this batch id

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)"))

  private def applyWave(spark: SparkSession, d: String, root: String,
      i: Int): Double = {
    val dA = Tables.orders(spark, d)
      .where(pmod(col("o_orderkey"), lit(Batches)) === i)
      .select("o_custkey", "o_orderstatus", "o_totalprice")
    val dB = Tables.customer(spark, d)
      .where(pmod(col("c_custkey"), lit(Batches)) === i)
      .select("c_custkey", "c_mktsegment")
    val t0 = System.nanoTime()
    graft.api.IncrementalJoinAgg.applyBatch(dA, dB, i.toLong, root)(
      join = (a, b) => a.join(b, a("o_custkey") === b("c_custkey")),
      partialsOf = j => j.groupBy("c_mktsegment", "o_orderstatus")
        .agg(dsum(col("o_totalprice")).as("p_sum_price"),
          count(lit(1)).as("p_cnt")),
      merge = (prev, p) => prev.unionByName(p)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(sum(col("p_sum_price")).cast("decimal(28,6)").as("p_sum_price"),
          sum(col("p_cnt")).as("p_cnt")))
    (System.nanoTime() - t0) / 1e9
  }

  private def finalRows(spark: SparkSession, root: String): Set[Seq[Any]] =
    graft.api.IncrementalJoinAgg.state(spark, root).get
      .select(col("c_mktsegment"), col("o_orderstatus"),
        col("p_sum_price").cast("double"), col("p_cnt"))
      .collect().map(_.toSeq).toSet

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.tunedSession("graft-joinmv-bench")
    val base = java.nio.file.Files.createTempDirectory("graft-joinmv").toString
    val plainRoot = s"$base/plain"
    val compRoot = s"$base/compacted"
    Bench.calibProbe(spark)
    val calib = Bench.calibrate(spark)

    val plain = (0 until Batches).map(i => applyWave(spark, d, plainRoot, i))
    val comp = (0 until Batches).map { i =>
      val sec = applyWave(spark, d, compRoot, i)
      if (i == CompactAt) {
        val made = graft.api.IncrementalJoinAgg.compactHistory(spark, compRoot,
          keyA = Seq("o_custkey"), keyB = Seq("c_custkey"))
        require(made.exists(_.nonEmpty), "compaction made no segment")
        graft.api.IncrementalJoinAgg.vacuumHistory(compRoot)
      }
      sec
    }

    // parity: compaction is layout-only — identical stored partials
    require(finalRows(spark, plainRoot) == finalRows(spark, compRoot),
      "compacted root diverged from plain root")

    val tail = (CompactAt + 1) until Batches
    val tailPlain = tail.map(plain).sum / tail.size
    val tailComp = tail.map(comp).sum / tail.size
    def dirs(root: String, side: String): Int =
      graft.api.IncrementalJoinAgg.liveSegments(root, side).size
    import Bench.num
    val doc = s"""{
  "sf_dir": "$d",
  "batches": $Batches,
  "compact_after_batch": $CompactAt,
  "calib_sec": ${num(calib, 4)},
  "per_step_plain_sec": [${plain.map(num(_, 3)).mkString(", ")}],
  "per_step_compacted_sec": [${comp.map(num(_, 3)).mkString(", ")}],
  "tail_mean_plain_sec": ${num(tailPlain, 3)},
  "tail_mean_compacted_sec": ${num(tailComp, 3)},
  "tail_ratio": ${num(tailComp / math.max(tailPlain, 1e-9), 3)},
  "live_dirs_end_plain": {"a": ${dirs(plainRoot, "a")}, "b": ${dirs(plainRoot, "b")}},
  "live_dirs_end_compacted": {"a": ${dirs(compRoot, "a")}, "b": ${dirs(compRoot, "b")}},
  "parity": "identical final partials"
}
"""
    val out = sys.env.getOrElse("GRAFT_JOINMV_JSON", "bench_joinmv_r18.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(doc)
    spark.stop()
  }
}
