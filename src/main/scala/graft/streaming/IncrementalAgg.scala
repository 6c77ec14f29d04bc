package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming materialized-view maintenance: a stored partial-aggregate
  * table kept current by merging each micro-batch's partials — the
  * streaming face of `operators.Maintenance.qIncrAgg`, and the production
  * answer to "keep a 100 TB aggregate fresh without rescanning history".
  *
  * State is partials (sum DECIMAL, count), NOT finals, so the per-batch
  * merge is associative and the read-time view derives avg exactly; the
  * decimal sums make the stored state independent of both partition order
  * and batch arrival order — after any prefix of batches the state equals
  * the batch aggregate over exactly the rows delivered so far.
  *
  * Exactly-once: Structured Streaming replays a failed `foreachBatch`
  * with the SAME `batchId`, so the merge records the last applied id and
  * skips re-deliveries (the standard idempotent-sink contract; pinned in
  * `StreamingSpec` by applying one batch twice). The swap is
  * write-new-directory-then-repoint (a `_CURRENT` pointer file), giving
  * readers an atomic view without a table format; on a real deployment
  * this slot is filled by Delta/Iceberg `MERGE`.
  */
object IncrementalAgg {

  private def stateDir(root: String): java.nio.file.Path =
    java.nio.file.Paths.get(root)

  private def currentPath(root: String): Option[String] = {
    val p = stateDir(root).resolve("_CURRENT")
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim).filter(_.nonEmpty)
    else None
  }

  /** The stored partials for `root`, or None before the first batch. */
  def state(spark: SparkSession, root: String): Option[DataFrame] =
    currentPath(root).map(v => spark.read.parquet(s"$root/$v"))

  /** Read-time view: finals derived from the stored partials. */
  def view(spark: SparkSession, root: String): Option[DataFrame] =
    state(spark, root).map(_.groupBy("grp")
      .agg(sum("p_sum").as("s"), sum("p_cnt").as("c"))
      .select(col("grp"),
        round(col("s").cast("double"), 2).as("sum_v"),
        col("c").as("cnt"),
        round(col("s").cast("double") / col("c"), 4).as("avg_v")))

  /** Pointer-file update via temp write + atomic rename (`ATOMIC_MOVE`):
    * crash-consistent — readers see either the old or the new content,
    * never a torn/empty file. NOT power-fail durable: neither the temp
    * file nor the directory entry is fsynced, so an OS crash can roll the
    * pointer back to the previous (still valid) version. */
  private def writeAtomic(p: java.nio.file.Path, content: String): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def lastApplied(root: String): Long = {
    val p = stateDir(root).resolve("_LAST_BATCH")
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p).trim.toLong
    else -1L
  }

  /** Merge one micro-batch (idempotent on `batchId`): partials(batch) ⊎
    * stored partials, written to a fresh versioned directory, then the
    * `_CURRENT` pointer and `_LAST_BATCH` marker advance. */
  def applyBatch(batch: DataFrame, batchId: Long, root: String,
      grp: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column): Unit =
    applyVersioned(batch, batchId, root)(
      b => b.groupBy(grp.as("grp"))
        .agg(sum(value.cast("decimal(18,6)")).as("p_sum"), count(lit(1)).as("p_cnt")),
      (prev, partials) => prev.unionByName(partials)
        .groupBy("grp")
        .agg(sum(col("p_sum")).as("p_sum"), sum(col("p_cnt")).as("p_cnt")))

  /** The reusable versioned-merge protocol behind [[applyBatch]]: any
    * associative partial shape (sums/counts, histogram bins, …) gets the
    * same batchId-idempotent ledger, write-new-then-repoint atomic swap,
    * and O(1)-version GC. `partialsOf` reduces one micro-batch to its
    * partials; `merge` folds them into the stored state. */
  private[graft] def applyVersioned(batch: DataFrame, batchId: Long, root: String)
      (partialsOf: DataFrame => DataFrame,
       merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    java.nio.file.Files.createDirectories(stateDir(root))
    if (batchId <= lastApplied(root)) return // replay of an applied batch
    val spark = batch.sparkSession
    val partials = partialsOf(batch)
    val merged = state(spark, root) match {
      case Some(prev) => merge(prev, partials)
      case None => partials
    }
    val prevVersion = currentPath(root)
    val version = s"v$batchId"
    merged.write.mode("overwrite").parquet(s"$root/$version")
    // order matters: data first, then the pointer, then the idempotence
    // marker — a crash between steps replays the batch against the OLD
    // pointer (no partial state is ever visible). Pointer files move into
    // place atomically (write-temp-then-rename): an in-place truncate+write
    // could be caught mid-write, leaving _CURRENT empty (read back as "no
    // state" → silent history loss) or pointing at a GC'd version.
    writeAtomic(stateDir(root).resolve("_CURRENT"), version)
    writeAtomic(stateDir(root).resolve("_LAST_BATCH"), batchId.toString)
    // GC: the superseded version is unreachable once the pointer moved;
    // removing it keeps state at O(1) versions across an unbounded stream
    prevVersion.filter(_ != version).foreach { v =>
      val dir = stateDir(root).resolve(v)
      if (java.nio.file.Files.isDirectory(dir)) {
        java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  /** Wire a streaming DataFrame into the maintained aggregate. */
  def maintain(input: DataFrame, root: String, checkpoint: String,
      grp: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column)
      : org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) =>
        applyBatch(batch, id, root, grp, value))
      .start()
}
