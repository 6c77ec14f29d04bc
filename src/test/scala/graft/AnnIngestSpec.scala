package graft

import graft.api.{AnnIndex, AnnIngest, VectorSearch}
import org.apache.spark.sql.functions._

/** Incremental ANN-index maintenance: frozen-model ingest ∘ compact ∘
  * search ≡ a one-shot index over everything ingested, exactly-once
  * lifecycle, plan-gated pruned reads across segments. */
class AnnIngestSpec extends SparkSpec {

  private def normed(d: String) =
    VectorSearch.withNorm(Tables.embeddings(spark, d),
      col("vec_id"), col("embedding"), col("label"))

  private lazy val corpus = normed(sf("sf0.001"))
  private lazy val base = corpus.where(col("id") % 3 =!= 0)
  private lazy val cents = VectorSearch.ivfFitKMeans(base, nCells = 8, iters = 2)

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft-anning").toString

  private def lifecycle(root: String): Unit = {
    AnnIngest.ingest(spark, root, base, cents, 0L)
    AnnIngest.ingest(spark, root,
      corpus.where(col("id") % 3 === 0 && col("id") % 2 === 0), cents, 1L)
    AnnIngest.compact(spark, root)
    AnnIngest.vacuum(root)
    AnnIngest.ingest(spark, root,
      corpus.where(col("id") % 3 === 0 && col("id") % 2 === 1), cents, 2L)
  }

  test("ingest ∘ compact ∘ search ≡ one-shot index over the union (frozen model)") {
    val root = freshRoot()
    lifecycle(root)
    // live layout: the compacted c1 + the post-compact b2 segment
    assert(AnnIngest.liveSegments(root) == Seq("seg-c1", "seg-b2"))
    val qs = corpus.where(col("id") < 10)
    val inc = AnnIngest.searchTopK(spark, root, cents, qs, k = 5, nprobe = 3)
      .orderBy("qid", "rnk").collect()
    // the one-shot reference: the SAME frozen model assigning everything
    val oneShot = VectorSearch.ivfTopK(
      VectorSearch.ivfAssign(corpus, cents), cents, qs, k = 5, nprobe = 3)
      .orderBy("qid", "rnk").collect()
    assert(inc.nonEmpty && inc.toSeq == oneShot.toSeq)
  }

  test("replayed lifecycle is a no-op; a stale batch id never applies") {
    val root = freshRoot()
    lifecycle(root)
    def search() = AnnIngest.searchTopK(spark, root, cents,
      corpus.where(col("id") < 10), k = 5, nprobe = 3)
      .orderBy("qid", "rnk").collect().toSeq
    val before = search()
    lifecycle(root) // full replay: every ingest id <= lastBatch
    // a second compact folds c1+b2 -> c2, a layout-only move
    assert(AnnIngest.liveSegments(root) == Seq("seg-c2"))
    assert(search() == before, "replay or re-compact changed the search result")
    // the replay's own vacuum already reclaimed the folded segments: only
    // the compacted layout remains on disk, and it serves alone
    val onDisk = new java.io.File(root).list().filter(_.startsWith("seg-")).toSeq
    assert(onDisk == Seq("seg-c2"), s"got $onDisk")
    assert(AnnIngest.vacuum(root).isEmpty, "nothing left to reclaim")
    assert(search() == before)
  }

  test("an empty ingest batch advances the ledger without a segment") {
    val root = freshRoot()
    AnnIngest.ingest(spark, root, base, cents, 0L)
    // quiet feed: the batch applies (ledger moves) but writes no
    // footerless partitioned dir — searches keep working
    AnnIngest.ingest(spark, root, corpus.limit(0), cents, 1L)
    assert(AnnIngest.liveSegments(root) == Seq("seg-b0"))
    assert(graft.api.StateManifest.current(root).get.lastBatch == 1L)
    // the skipped id never re-applies
    AnnIngest.ingest(spark, root, corpus.where(col("id") % 3 === 0), cents, 1L)
    assert(AnnIngest.liveSegments(root) == Seq("seg-b0"),
      "a replayed (already-ledgered) id must not apply late data")
    val out = AnnIngest.searchTopK(spark, root, cents,
      corpus.where(col("id") < 10), k = 5, nprobe = 3)
    assert(out.count() > 0)
  }

  test("pruned multi-segment read lists only probed cell dirs; gate throws unpruned") {
    val root = freshRoot()
    lifecycle(root)
    val q1 = corpus.where(col("id") === 1)
    val cells = AnnIndex.probedCells(VectorSearch.ivfProbes(q1, cents, nprobe = 2))
    val pruned = AnnIngest.readCells(spark, root, cells)
    AnnIngest.assertPruned(pruned, root, cells)
    val full = AnnIngest.liveSegments(root)
      .map(sg => spark.read.parquet(s"$root/$sg"))
      .reduce(_ unionByName _)
    intercept[IllegalStateException](AnnIngest.assertPruned(full, root, cells))
  }

  test("q_incr_ann runs end-to-end (self-gate live)") {
    val out = SparkEntry.queries("q_incr_ann")(spark, sf("sf0.001"))
    assert(out.count() > 0)
  }

  test("vacuum skips an in-flight writer's directory, reaps committed-era orphans") {
    val root = freshRoot()
    AnnIngest.ingest(spark, root, base, cents, 0L)
    // an ingest that has written its segment but not yet committed: its
    // id is above the ledger — vacuum must leave it alone (ADVICE r17)
    val inflight = new java.io.File(s"$root/seg-b7"); inflight.mkdirs()
    // a true orphan (aborted CAS at an id the ledger already covers)
    val orphan = new java.io.File(s"$root/seg-c0"); orphan.mkdirs()
    assert(AnnIngest.vacuum(root) == Seq("seg-c0"))
    assert(inflight.isDirectory, "in-flight segment must survive vacuum")
    assert(!orphan.exists, "committed-era orphan must be reclaimed")
  }

  test("maybeCompact folds the layout only above the segment threshold") {
    val root = freshRoot()
    AnnIngest.ingest(spark, root, base, cents, 0L)
    AnnIngest.ingest(spark, root,
      corpus.where(col("id") % 3 === 0 && col("id") % 2 === 0), cents, 1L)
    // at the threshold: policy declines, layout untouched
    assert(AnnIngest.maybeCompact(spark, root, maxSegments = 2).isEmpty)
    assert(AnnIngest.liveSegments(root) == Seq("seg-b0", "seg-b1"))
    AnnIngest.ingest(spark, root,
      corpus.where(col("id") % 3 === 0 && col("id") % 2 === 1), cents, 2L)
    // above it: compact runs AND its vacuum reclaims the folded segments
    assert(AnnIngest.maybeCompact(spark, root, maxSegments = 2).contains("seg-c2"))
    assert(AnnIngest.liveSegments(root) == Seq("seg-c2"))
    val onDisk = new java.io.File(root).list().filter(_.startsWith("seg-")).toSeq
    assert(onDisk == Seq("seg-c2"), s"got $onDisk")
    // layout-only: search parity with the one-shot frozen-model index
    val qs = corpus.where(col("id") < 10)
    val inc = AnnIngest.searchTopK(spark, root, cents, qs, k = 5, nprobe = 3)
      .orderBy("qid", "rnk").collect()
    val oneShot = VectorSearch.ivfTopK(
      VectorSearch.ivfAssign(corpus, cents), cents, qs, k = 5, nprobe = 3)
      .orderBy("qid", "rnk").collect()
    assert(inc.nonEmpty && inc.toSeq == oneShot.toSeq)
  }
}
