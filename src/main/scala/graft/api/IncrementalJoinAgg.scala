package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental maintenance for Aggregate-over-JOIN materialized views —
  * the WRITE path [[MaterializedView]] was missing for join definitions
  * (r15 verdict #3): [[graft.api.IncrementalJoin]] owns the delta rule
  * for the join, [[graft.streaming.IncrementalAgg]] owns the
  * partial-merge protocol for the aggregate; this composes them so a
  * star-join view advances at O(Δ ⋈ history) per step instead of a full
  * `refresh` from base.
  *
  * Per applied batch (ΔA, ΔB):
  *
  * {{{  ΔJ      = ΔA ⋈ B_acc  ∪  A_acc ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *      state' = merge(state, partialsOf(ΔJ))                      }}}
  *
  * so after any prefix of batches the stored partials equal the
  * definition evaluated over exactly the rows ingested so far
  * (MaintenanceSpec pins this after EVERY step under 1/2/3-way
  * batchings) — the join rows themselves never materialize beyond the
  * delta terms, and nothing ever joins A_full ⋈ B_full after bootstrap.
  *
  * State layout under `root` (all commits through the shared
  * [[StateManifest]] — version pointer, batch ledger, and schema
  * fingerprint advance in ONE atomic rename):
  *
  *   - `a/b<id>/`, `b/b<id>/` — each side's delta, written once per
  *     applied batch. The accumulated side reads the UNION of committed
  *     batch directories (ledger-filtered), so accumulation is an O(Δ)
  *     append, never a rewrite — and a crashed batch's orphan delta
  *     directory is invisible until its manifest commit lands.
  *   - `v<id>/` — the merged view partials (group-sized, the only
  *     O(|state|) write per step).
  *
  * Exactly-once: a replay of an applied `batchId` is a no-op (ledger
  * check), and a replay of a CRASHED batch overwrites its own delta and
  * version directories before the commit — the same idempotent-sink
  * contract as [[graft.streaming.IncrementalAgg.applyVersioned]].
  *
  * Scale shape (100 TB): the two cross terms are delta-against-history
  * joins — small-side broadcast or co-partitioned when history is stored
  * bucketed by the join key — and ΔA ⋈ ΔB is delta-sized; the partials
  * merge touches group-sized state only. A day's ingest therefore costs
  * O(Δ ⋈ history) + O(groups), while the `refresh` path it replaces
  * rescans both full bases and rebuilds the join.
  */
object IncrementalJoinAgg {

  private def lastApplied(root: String): Long =
    StateManifest.current(root).map(_.lastBatch).getOrElse(-1L)

  /** The stored view partials, or None before the first applied batch. */
  def state(spark: SparkSession, root: String): Option[DataFrame] =
    StateManifest.current(root).flatMap(_.segments.headOption)
      .map(v => spark.read.parquet(s"$root/$v"))

  /** One side's accumulated committed deltas (ledger-filtered: a crashed
    * batch's orphan directory never reads back). */
  private def accumulated(spark: SparkSession, root: String,
      side: String): Option[DataFrame] = {
    val last = lastApplied(root)
    val dirs = Option(new java.io.File(s"$root/$side").list())
      .getOrElse(Array.empty[String])
      .filter(n => n.startsWith("b") &&
        n.drop(1).toLongOption.exists(_ <= last))
      .map(n => s"$root/$side/$n")
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.toIndexedSeq: _*))
  }

  /** Apply one aligned delta pair (idempotent on `batchId`; use an empty
    * frame for a quiet side). `join` must be the view's own INNER
    * equi-join, applied verbatim to each delta term; `partialsOf` reduces
    * join rows to the stored partial-aggregate shape; `merge` folds new
    * partials into the stored state and must keep the state schema STABLE
    * (cast widening sums back — the manifest's fingerprint gate refuses a
    * drifting layout, same as [[graft.streaming.IncrementalAgg]]). */
  def applyBatch(dA: DataFrame, dB: DataFrame, batchId: Long, root: String)(
      join: (DataFrame, DataFrame) => DataFrame,
      partialsOf: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    if (batchId <= lastApplied(root)) return // replay of an applied batch
    val spark = dA.sparkSession
    // accumulators resolve BEFORE this batch's directories land (the
    // ledger filter makes that true even on crash-replay)
    val aPrev = accumulated(spark, root, "a")
    val bPrev = accumulated(spark, root, "b")
    dA.write.mode("overwrite").parquet(s"$root/a/b$batchId")
    dB.write.mode("overwrite").parquet(s"$root/b/b$batchId")
    // re-read the just-written deltas: every delta term then joins parquet
    // against parquet — per-step lineage stays flat without checkpointing
    val dAr = spark.read.parquet(s"$root/a/b$batchId")
    val dBr = spark.read.parquet(s"$root/b/b$batchId")
    val deltaJ = Seq(
      bPrev.map(b => join(dAr, b)), // ΔA ⋈ B_acc
      aPrev.map(a => join(a, dBr)), // A_acc ⋈ ΔB
      Some(join(dAr, dBr))          // ΔA ⋈ ΔB
    ).flatten.reduce(_ unionByName _)
    val partials = partialsOf(deltaJ)
    val merged = state(spark, root) match {
      case Some(prev) => merge(prev, partials)
      case None => partials
    }
    val prevVersion = StateManifest.current(root).flatMap(_.segments.headOption)
    val version = s"v$batchId"
    merged.write.mode("overwrite").parquet(s"$root/$version")
    val fp = StateManifest.schemaFingerprint(merged.schema)
    StateManifest.current(root).map(_.schemaFp)
      .filter(f => f.nonEmpty && f != fp).foreach { f =>
        throw new IllegalStateException(
          s"state schema drift at $root: manifest=$f batch=$fp")
      }
    // data first — deltas AND view version — then the one atomic commit;
    // a crash anywhere before it replays the batch against the old
    // manifest and no partial state is ever visible
    StateManifest.commit(root, Seq(version), batchId, fp)
    StateManifest.pruneHistory(root, keep = 2)
    // GC view versions like IncrementalAgg (current + previous = one
    // commit of time travel); delta directories are the accumulated
    // history itself and are retained — they ARE the view's base
    val retain = Set(version) ++ prevVersion
    Option(new java.io.File(root).list()).getOrElse(Array.empty[String])
      .filter(n => n.startsWith("v") && !retain.contains(n))
      .foreach { v =>
        val dir = java.nio.file.Paths.get(root).resolve(v)
        if (java.nio.file.Files.isDirectory(dir)) {
          val walk = java.nio.file.Files.walk(dir)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally walk.close()
        }
      }
  }
}
