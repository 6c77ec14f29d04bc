package graft

import graft.api.{AnnIndex, VectorSearch}
import org.apache.spark.sql.functions._

/** The cell-partitioned ANN index layout: pruned read ≡ full-frame search,
  * and the prune is a PLAN fact (directory listing == probed cells), not a
  * claim. */
class AnnIndexSpec extends SparkSpec {

  private def normed(d: String) =
    VectorSearch.withNorm(Tables.embeddings(spark, d),
      col("vec_id"), col("embedding"), col("label"))

  private lazy val corpus = normed(sf("sf0.001"))
  private lazy val cents =
    VectorSearch.ivfFitKMeans(corpus, nCells = 8, iters = 2)
  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.build(corpus, cents, dir)
    dir
  }

  test("indexed search returns exactly the full-frame ivfTopK rows") {
    val qs = corpus.where(col("id") < 10)
    val live = VectorSearch.ivfTopK(
      VectorSearch.ivfAssign(corpus, cents), cents, qs, k = 5, nprobe = 3)
      .orderBy("qid", "rnk").collect()
    val idx = AnnIndex.ivfTopKIndexed(spark, indexDir, cents, qs, k = 5, nprobe = 3)
      .orderBy("qid", "rnk").collect()
    assert(live.nonEmpty)
    assert(idx.toSeq == live.toSeq)
  }

  test("the index scan lists ONLY the probed cells' directories") {
    val q1 = corpus.where(col("id") === 0)
    val cells = AnnIndex.probedCells(VectorSearch.ivfProbes(q1, cents, nprobe = 2))
    assert(cells.size == 2)
    val existing = AnnIndex.existingCells(indexDir)
    assert(existing.size > cells.size, "need strictly more cells than probes")
    val pruned = AnnIndex.readCells(spark, indexDir, cells)
    // the gate passes on the pruned read...
    AnnIndex.assertPruned(pruned, indexDir, cells)
    // ...its scanned bytes are a strict subset of the index...
    val scanned = AnnIndex.scannedBytes(pruned, indexDir)
    val total = AnnIndex.totalBytes(indexDir)
    assert(scanned > 0 && scanned < total,
      s"scanned $scanned of $total bytes — expected a strict subset")
    // ...and the gate THROWS on an unpruned read of the same index
    val full = spark.read.parquet(indexDir)
    intercept[IllegalStateException](AnnIndex.assertPruned(full, indexDir, cells))
  }

  test("probing a nonexistent (empty) cell is tolerated by the gate") {
    // an empty cell writes no directory: expected count is the INTERSECT
    // with existing dirs, so a probe of a hole must not fail the gate
    val cells = AnnIndex.probedCells(
      VectorSearch.ivfProbes(corpus.where(col("id") === 0), cents, nprobe = 2))
    val withHole = cells :+ 9999
    val pruned = AnnIndex.readCells(spark, indexDir, withHole)
    AnnIndex.assertPruned(pruned, indexDir, withHole)
  }

  test("q_sim_ivf serves from the persisted index (self-gate live)") {
    // the oracle row itself: its body throws unless the plan pruned, so a
    // nonempty result here proves the gated path end-to-end
    val out = SparkEntry.queries("q_sim_ivf")(spark, sf("sf0.001"))
    assert(out.count() > 0)
  }

  test("filtered search: predicate pushed into the pruned read, composing both gates") {
    val qs = corpus.where(col("id") < 10)
    val cells = AnnIndex.probedCells(VectorSearch.ivfProbes(qs, cents, nprobe = 3))
    val filtered = AnnIndex.readCells(spark, indexDir, cells)
      .where(col("label").isin(0, 3, 6, 9))
    val out = VectorSearch.ivfTopK(filtered, cents, qs, k = 5, nprobe = 3)
    // both plan gates hold on one scan: directory pruning AND the pushed
    // predicate (row-group min/max skipping inside the probed cells)
    AnnIndex.assertPruned(out, indexDir, cells)
    AnnIndex.assertFilterPushed(out, indexDir, "In(label")
    // the filter gate THROWS when the predicate never reaches the scan
    val unpushed = VectorSearch.ivfTopK(
      AnnIndex.readCells(spark, indexDir, cells), cents, qs, k = 5, nprobe = 3)
    intercept[IllegalStateException](
      AnnIndex.assertFilterPushed(unpushed, indexDir, "In(label"))
    // results: every neighbor satisfies the predicate, and they equal the
    // filtered full-frame search (pre-filtering loses nothing vs the same
    // algorithm over the live frame)
    val got = out.orderBy("qid", "rnk").collect()
    assert(got.nonEmpty)
    val nids = got.map(_.getAs[Long]("nid")).toSet
    val okLabels = corpus.where(col("label").isin(0, 3, 6, 9))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(nids.subsetOf(okLabels), "a neighbor escaped the predicate")
    val live = VectorSearch.ivfTopK(
      VectorSearch.ivfAssign(corpus, cents).where(col("label").isin(0, 3, 6, 9)),
      cents, qs, k = 5, nprobe = 3).orderBy("qid", "rnk").collect()
    assert(got.toSeq == live.toSeq)
  }

  test("q_ann_filtered runs end-to-end (both self-gates live)") {
    val out = SparkEntry.queries("q_ann_filtered")(spark, sf("sf0.001"))
    assert(out.count() > 0)
  }
}
