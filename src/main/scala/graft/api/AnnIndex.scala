package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Cell-partitioned ANN index: the PERSISTED layout of an IVF corpus.
  *
  * [[VectorSearch.ivfTopK]] computes assignment inline and equi-joins the
  * whole corpus frame on the cell id — correct, but at 100 TB every query
  * still FEEDS the full corpus into that join. This module closes the
  * loop: the assigned corpus is written once, Hive-partitioned by its IVF
  * cell (`dir/cell=N/...`), so a search LISTS only the probed cells'
  * directories — scan cost tracks `Σ |probed cells|`, i.e. ~nprobe/nCells
  * of the data per query, BEFORE any row is read (the same directory-level
  * pruning a date-partitioned fact table gets, [[Layout.writePartitioned]]).
  * With the scale-adaptive sizing ([[VectorSearch.NprobeDenom]]) that is a
  * hard ≤ 1/8-of-corpus bound on bytes touched per query.
  *
  * Build cost: one assignment pass + one partitioned write per corpus
  * snapshot — paid once, amortized over every query (the same
  * write-once/read-forever contract as the bucketed join layout). Cell
  * counts are ≈ √N ([[VectorSearch.ivfCellsFor]], ≤ 4096), so the
  * partition-directory count stays catalog-friendly at any corpus size.
  *
  * Searches SELF-GATE with [[assertPruned]]: the query throws unless the
  * index scan listed exactly the probed cells' directories — the
  * q_partition_prune discipline applied to the ANN surface, so the pruned
  * read is proven (plan-checked) on every run, not claimed.
  */
object AnnIndex {

  /** Assign every corpus vector to its IVF cell (the budget-dispatched
    * [[VectorSearch.ivfAssign]] gear) and write the frame Hive-partitioned
    * by `cell` under `dir`. Corpus must be [[VectorSearch.withNorm]]-shaped
    * (`id`, `v`, `nrm`, keep...). */
  def build(corpus: DataFrame, cents: Array[Array[Double]], dir: String): Unit =
    Layout.writePartitioned(VectorSearch.ivfAssign(corpus, cents), dir, "cell")

  /** Distinct probed cells of an [[VectorSearch.ivfProbes]] frame, sorted —
    * model-sized driver traffic (≤ |Q|·nprobe ints) by construction. */
  def probedCells(probes: DataFrame): Seq[Int] =
    probes.select(col("pcell")).distinct().collect()
      .map(_.getInt(0)).sorted.toIndexedSeq

  private def normPath(dir: String): String =
    java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString

  /** Cells that exist as partition directories under `dir` — a cell that
    * went empty at assignment time has no directory, so a probe of it
    * scans nothing. CACHED per directory (round 18, VERDICT r17 #4/#5):
    * an index directory and a committed ingest segment are both immutable
    * (a rebuild lands under a new fingerprint-keyed name; segment names
    * under a root are monotone in the batch ledger, never reused), so the
    * listing is one metadata op per directory per process instead of per
    * query — at production query rates the per-query driver listing was
    * exactly the pressure the (session, dir) frame cache removed.
    * [[invalidate]] drops entries when a vacuum deletes the directory. */
  def existingCells(dir: String): Set[Int] =
    cellsCache.computeIfAbsent(normPath(dir), d =>
      Option(new java.io.File(d).listFiles()).iterator.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.getName.stripPrefix("cell=").toInt).toSet)

  private val cellsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[Int]]()

  /** Drop cached metadata/frames for a deleted directory (vacuum). */
  private[api] def invalidate(dir: String): Unit = {
    val key = normPath(dir)
    cellsCache.remove(key)
    baseCache.synchronized {
      baseCache.values.forEach(m => m.remove(key))
    }
  }

  /** Base frame per (session, dir), cached: schema inference + the
    * partition-directory index build once per process instead of per
    * query. Safe because an index directory is immutable once built — a
    * data regeneration moves the source fingerprint and lands the rebuilt
    * index under a NEW directory name (`Similarity.ivfIndexDir`).
    * WEAK-keyed by the session itself (reference identity — SparkSession
    * doesn't override equals): a stopped-and-collected session releases
    * its frames, and no identity-hash reuse can ever serve a frame bound
    * to a dead SparkContext. */
  private val baseCache =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, DataFrame]]()
  private[api] def baseFrame(spark: SparkSession, dir: String): DataFrame =
    baseCache.synchronized {
      baseCache.computeIfAbsent(spark, _ => new java.util.HashMap[String, DataFrame]())
        .computeIfAbsent(normPath(dir), d => spark.read.parquet(d))
    }

  /** Pruned read: only the probed cells' directories enter the scan. The
    * `isin` is a static partition filter — the listing never touches other
    * `cell=` directories ([[assertPruned]] proves it per query). */
  def readCells(spark: SparkSession, dir: String, cells: Seq[Int]): DataFrame = {
    require(cells.nonEmpty, "readCells: no probed cells")
    baseFrame(spark, dir).where(col("cell").isin(cells.map(Int.box): _*))
  }

  /** The plan's scans of `dir`: (partitions listed, bytes selected). */
  private def indexScans(df: DataFrame, dir: String): Seq[(Int, Long)] = {
    val want = normPath(dir)
    df.queryExecution.sparkPlan.collectLeaves().collect {
      // separator-bounded match (ADVICE r17): bare startsWith would count
      // a SIBLING directory sharing the hex-name prefix into the gate
      case f: FileSourceScanExec if f.relation.location.rootPaths
          .map(_.toUri.getPath)
          .exists(p => p == want || p.startsWith(want + "/")) =>
        val parts = f.selectedPartitions
        (parts.partitionCount, parts.totalFileSize)
    }.toIndexedSeq
  }

  /** Bytes the plan's index scan selected (the pruned size) — for pricing
    * scanned-bytes ∝ probed-cells in the scale bench. */
  def scannedBytes(df: DataFrame, dir: String): Long =
    indexScans(df, dir).map(_._2).sum

  /** Total on-disk size of the index (all cells), via one recursive walk. */
  def totalBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    val s = java.nio.file.Files.walk(root)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  /** Throw unless every scan of `dir` in `df`'s plan listed EXACTLY the
    * probed-and-existing cell directories — the self-gate that makes the
    * pruned read a plan-checked fact. */
  def assertPruned(df: DataFrame, dir: String, cells: Seq[Int]): Unit = {
    val expect = cells.toSet.intersect(existingCells(dir)).size
    val scans = indexScans(df, dir)
    if (scans.isEmpty) throw new IllegalStateException(
      s"ann index: no file scan of $dir in the plan (index not read?)")
    scans.foreach { case (n, _) =>
      if (n != expect) throw new IllegalStateException(
        s"ann index: scan listed $n cell directories, expected $expect " +
          s"(probed ${cells.size}, existing ${existingCells(dir).size}) — pruning did not hold")
    }
  }

  /** Throw unless every scan of `dir` in `df`'s plan carries `needle`
    * inside its `PushedFilters` — the self-gate for FILTERED search over
    * the index: a metadata predicate must reach the parquet reader (row
    * groups whose min/max exclude the wanted values never decode), not
    * run as a post-scan filter over every candidate row. */
  def assertFilterPushed(df: DataFrame, dir: String, needle: String): Unit = {
    val want = normPath(dir)
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
          .map(_.toUri.getPath)
          .exists(p => p == want || p.startsWith(want + "/")) => f
    }
    if (scans.isEmpty) throw new IllegalStateException(
      s"ann index: no file scan of $dir in the plan (index not read?)")
    scans.foreach { f =>
      val pushed = f.metadata.getOrElse("PushedFilters", "")
      if (!pushed.contains(needle)) throw new IllegalStateException(
        s"ann index: filter '$needle' not pushed to the index scan (PushedFilters: $pushed)")
    }
  }

  /** IVF top-k over the PERSISTED index: probe cells per query, read ONLY
    * those cells' directories, exact re-rank — then [[assertPruned]].
    * Result rows are identical to [[VectorSearch.ivfTopK]] over the live
    * frame (candidates only ever come from probed cells), so the same SQL
    * oracle hash-gates both. The probed-cell union is collected once
    * (model-sized); an empty union (degenerate model) yields the empty
    * result shape. */
  def ivfTopKIndexed(spark: SparkSession, dir: String,
      cents: Array[Array[Double]], queries: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val cells = probedCells(VectorSearch.ivfProbes(queries, cents, nprobe))
    if (cells.isEmpty)
      return spark.range(0).select(col("id").as("qid"), col("id").as("nid"),
        col("id").cast("int").as("rnk"), col("id").cast("double").as("cos"))
    val out = VectorSearch.ivfTopK(
      readCells(spark, dir, cells), cents, queries, k, nprobe)
    assertPruned(out, dir, cells)
    out
  }
}
