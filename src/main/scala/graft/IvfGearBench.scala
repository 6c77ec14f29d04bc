package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prices the IVF centroid-TABLE assignment gear where the reference
  * budget GENUINELY binds (`runMain graft.IvfGearBench`) — the follow-up
  * to the r15 crossover drill, which forced the gear with
  * GRAFT_IVF_REF_BUDGET=1 on sf0.1 data (a dispatch test, not a price at
  * binding scale).
  *
  * The binding configuration here is produced by DATA GROWTH, not a
  * forced budget. Measured √N model sizes (64-dim embeddings):
  *
  *   - sf0.1 (~2k rows)                    → 44 cells  = 22.5 KB
  *   - 10×  ([[PipelineScaleBench.scaleUp]], ~20k rows) → 141 cells = 72 KB
  *   - 100× (derived here, ~200k rows)      → 447 cells = 228 KB
  *
  * A 32 KB budget therefore sits BETWEEN the first two decades: the same
  * pipeline that rides the zero-exchange expression gear at sf0.1 crosses
  * into the broadcast-TABLE gear one decade later purely by growing —
  * which is how the default 16 MB budget behaves at 100 TB cell counts.
  * (With the 4096-cell clamp, 16 MB of centroid doubles binds only past
  * 512-dim embeddings — the clamp, not the budget, is the first gear at
  * 64 dims; the 32 KB drill budget reproduces the binding geometry two
  * decades early on the same √N rule.)
  *
  * THREE gears run EXPLICITLY on the SAME above-budget model in one
  * process (window-immune), at the 10× AND the 100× corpus:
  *   - `expr`: the in-plan reference-array expression (the below-budget
  *     default — the model rides every task binary);
  *   - `bc`: the broadcast-HANDLE expression ([[graft.api.VectorSearch
  *     .ivfAssignBc]]) — the above-budget DISPATCH TARGET: same
  *     zero-exchange codegen'd argmax, model moves once per executor;
  *   - `join`: the declarative broadcast centroid-TABLE + grouped argmax
  *     — kept for reference; its `first`/`max_by` aggregate carries
  *     array buffers, which Spark can only plan as a SortAggregate (a
  *     full spilling sort of |corpus| × nCells scored rows).
  * Measured per gear: assignment wall time + real shuffle bytes,
  * end-to-end IVF search (probe gear matched), cross-family recall_bp
  * (probes' copy families removed at BOTH derivation generations), and
  * exact assignment parity (symmetric exceptAll count, must be 0 — the
  * ApiSpec pins replayed at 200k rows).
  * Writes bench_ivf_gear_r18.json (override: GRAFT_IVF_GEAR_JSON).
  */
object IvfGearBench {

  private val Off = 100000000L      // PipelineScaleBench's copy offset
  private val Off2 = 10000000000L   // century-generation offset (disjoint)

  private def modelBytes(cents: Array[Array[Double]]): Long =
    cents.foldLeft(0L)((a, c) => a + 8L * c.length)

  /** min-of-2 noop-write timing (steady-state cost, same policy as the
    * inventory benches' retry: the second run prices the plan with its
    * generated classes already compiled). */
  private def time2(df: => DataFrame): Double =
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  /** Derive the 100× embeddings corpus from the 10× one: ids offset into
    * a disjoint range (no collision with first-generation copy ids) and a
    * copy-distinct perturbation, same geometry — the same "genuinely new
    * data" rule as [[PipelineScaleBench.scaleUp]]. Marker-cached. */
  private def deriveCentury(spark: SparkSession, src: String, dst: String): Unit = {
    val marker = java.nio.file.Paths.get(dst, "_GRAFT_SCALED_CENTURY")
    val stamp = s"src=$src fp=${graft.api.ModelCache.fingerprint(src, "embeddings")}"
    if (java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker) == stamp) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embElem = emb.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val reps = spark.range(10).select(col("id").as("__rep"))
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("__rep") * Off2).cast("long").as("vec_id"),
        transform(col("embedding"),
          x => (x + col("__rep").cast("double") * lit(0.0013)).cast(embElem))
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    java.nio.file.Files.writeString(marker, stamp)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft-pipe-sf1"
    val dst100 = if (args.length > 2) args(2) else "/tmp/graft-ivfgear-sf10"
    val spark = Bench.tunedSession("graft-ivf-gear")
    import graft.api.{VectorSearch => VS}
    import graft.functions.{IvfExprs, TopKAgg, VectorExprs}

    PipelineScaleBench.scaleUp(spark, src, dst)
    deriveCentury(spark, dst, dst100)

    val centsBase = graft.operators.Similarity.ivfCents(spark, src)
    // the budget the first measured decade itself crosses: sf0.1's model
    // below, the 10x model above
    val bindingBudget = 32L << 10

    val shuffle = Bench.addShuffleCounter(spark)
    Bench.calibProbe(spark)
    val calibPre = Bench.calibrate(spark)

    /** One full gear comparison at `dir`: returns the JSON fragment.
      * The corpus is repartitioned to the session's parallelism before
      * caching: the derived parquet is one ~50 MB file (1-2 scan splits),
      * and timing the join gear's map-side partial aggregate on a single
      * core would price a local-file pathology, not the gear — at 100 TB
      * the corpus is partitioned by construction. */
    def leg(dir: String): String = {
      val corpus = VS.withNorm(Tables.embeddings(spark, dir),
        col("vec_id"), col("embedding")).repartition(32).persist()
      val nRows = corpus.count()
      val cents = graft.operators.Similarity.ivfCents(spark, dir)
      val nprobe = graft.operators.Similarity.ivfNprobe(spark, dir)

      def assignExpr = corpus.withColumn("cell",
        IvfExprs.ivf_argmax(col("v"), col("nrm"), cents))
      def assignBc = VS.ivfAssignBc(corpus, cents)
      // the join gear is priced with ONE materialization per leg (its
      // SortAggregate runs minutes at the 100x corpus — min-of-2 would
      // only re-measure a price that is already unambiguous); parity
      // reads the persisted result instead of re-running the sort
      val assignJoin = VS.ivfAssignJoin(corpus, cents).persist()

      val s0 = shuffle(); val tExpr = time2(assignExpr)
      val s1 = shuffle(); val tBc = time2(assignBc)
      val s2 = shuffle()
      val tJoin = {
        val t0 = System.nanoTime()
        assignJoin.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val s3 = shuffle()

      // parity at full corpus size: the ApiSpec pins replayed at scale
      def mismOf(other: DataFrame): Long =
        assignExpr.select("id", "cell").exceptAll(other.select("id", "cell")).count() +
          other.select("id", "cell").exceptAll(assignExpr.select("id", "cell")).count()
      val mismBc = mismOf(assignBc)
      val mismJoin = mismOf(assignJoin)

      // cross-family corpus: remove the probes' copy families at both
      // derivation generations (root id = the pre-offset vec_id)
      val root = (col("id") % Off2) % Off
      val xfam = corpus.where(col("id") < 10 || root >= 10).persist()
      val q10 = xfam.where(col("id") < 10)

      def searchOf(assigned: DataFrame, probes: DataFrame): DataFrame = {
        val q = probes.select(col("id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"), col("pcell"))
        val cos = VectorExprs.dot_product(col("qv"), col("v")) / (col("qn") * col("nrm"))
        assigned.join(broadcast(q),
            col("cell") === col("pcell") && col("id") =!= col("qid"))
          .select(col("qid"), col("id").as("nid"), cos.as("cos"))
          .groupBy(col("qid"))
          .agg(TopKAgg.top_k_agg(col("cos"), col("nid"), 10).as("tk"))
          .select(col("qid"), explode(col("tk")).as("x"))
          .select(col("qid"), col("x.id").as("nid"))
      }
      def probesExpr = q10.withColumn("pcell",
        explode(IvfExprs.ivf_top_cells(col("v"), col("nrm"), cents, nprobe)))
      def probesBc = VS.ivfProbesBc(q10, cents, nprobe)
      def probesJoin = VS.ivfProbesJoin(q10, cents, nprobe)
      def xAssignExpr = xfam.withColumn("cell",
        IvfExprs.ivf_argmax(col("v"), col("nrm"), cents))
      // join gear: one xfam assignment materialization, reused by the
      // search timing and the recall leg (see the assign-section note)
      val xAssignJoin = VS.ivfAssignJoin(xfam, cents).persist()
      xAssignJoin.write.format("noop").mode("overwrite").save()

      val r0 = shuffle()
      val tSearchExpr = time2(searchOf(xAssignExpr, probesExpr))
      val r1 = shuffle()
      val tSearchBc = time2(searchOf(VS.ivfAssignBc(xfam, cents), probesBc))
      val r2 = shuffle()
      // timed DOWNSTREAM of the persisted assignment: the candidate join +
      // top-k is gear-independent; the gear difference is the assign row
      val tSearchJoin = time2(searchOf(xAssignJoin, probesJoin))
      val r3 = shuffle()

      val truth = VS.topK(xfam, q10, 10).select("qid", "nid").persist()
      def recallBp(hits: DataFrame): Double =
        truth.join(hits, Seq("qid", "nid"), "left_semi").count().toDouble /
          math.max(truth.count(), 1L) * 1e4
      val recallExpr = recallBp(searchOf(xAssignExpr, probesExpr))
      val recallBc = recallBp(searchOf(VS.ivfAssignBc(xfam, cents), probesBc))
      val recallJoin = recallBp(searchOf(xAssignJoin, probesJoin))
      truth.unpersist(); corpus.unpersist(); xfam.unpersist()
      assignJoin.unpersist(); xAssignJoin.unpersist()

      import Bench.num
      s""""corpus_rows": $nRows,
  "model_cells": ${cents.length},
  "model_bytes": ${modelBytes(cents)},
  "above_budget": ${modelBytes(cents) > bindingBudget},
  "assign": {
    "expr_sec": ${num(tExpr, 3)}, "bc_sec": ${num(tBc, 3)}, "join_sec": ${num(tJoin, 3)},
    "bc_over_expr": ${num(tBc / math.max(tExpr, 1e-9), 2)},
    "join_over_expr": ${num(tJoin / math.max(tExpr, 1e-9), 2)},
    "expr_shuffle_mb": ${num((s1 - s0) / 1e6, 2)},
    "bc_shuffle_mb": ${num((s2 - s1) / 1e6, 2)},
    "join_shuffle_mb": ${num((s3 - s2) / 1e6, 2)},
    "parity_mismatches_bc": $mismBc,
    "parity_mismatches_join": $mismJoin
  },
  "search_k10": {
    "expr_sec": ${num(tSearchExpr, 3)}, "bc_sec": ${num(tSearchBc, 3)}, "join_sec": ${num(tSearchJoin, 3)},
    "bc_over_expr": ${num(tSearchBc / math.max(tSearchExpr, 1e-9), 2)},
    "join_over_expr": ${num(tSearchJoin / math.max(tSearchExpr, 1e-9), 2)},
    "expr_shuffle_mb": ${num((r1 - r0) / 1e6, 2)},
    "bc_shuffle_mb": ${num((r2 - r1) / 1e6, 2)},
    "join_shuffle_mb": ${num((r3 - r2) / 1e6, 2)},
    "recall_bp_expr": ${num(recallExpr, 1)},
    "recall_bp_bc": ${num(recallBc, 1)},
    "recall_bp_join": ${num(recallJoin, 1)},
    "join_note": "join rows are timed downstream of a persisted assignment (its sort is priced once, in the assign section); expr/bc recompute their zero-exchange assignment inline"
  }"""
    }

    val leg10 = leg(dst)
    val leg100 = leg(dst100)
    val calibPost = Bench.calibrate(spark)

    import Bench.num
    val doc = s"""{
  "src": "$src",
  "model_bytes_base": ${modelBytes(centsBase)},
  "binding_budget_bytes": $bindingBudget,
  "binding_note": "the 32 KB budget sits between the measured decades: sf0.1's sqrt-N model (${centsBase.length} cells) rides the in-plan expression gear, the 10x corpus crosses into the above-budget gear by growth alone; the 100x leg prices the gears at 10x that corpus again. Dispatch above budget targets the broadcast-handle expression (bc); the declarative join gear is priced for reference. At 64 dims the default 16 MB budget is pre-empted by the 4096-cell clamp (it binds only past 512-dim embeddings); the drill budget reproduces the binding geometry on the same sqrt-N rule",
  "calib_pre_sec": ${num(calibPre, 4)},
  "calib_post_sec": ${num(calibPost, 4)},
  "leg_10x": {
  $leg10
  },
  "leg_100x": {
  $leg100
  }
}
"""
    val out = sys.env.getOrElse("GRAFT_IVF_GEAR_JSON", "bench_ivf_gear_r18.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(doc)
    spark.stop()
  }
}
