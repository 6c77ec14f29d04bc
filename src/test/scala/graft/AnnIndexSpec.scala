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
}
