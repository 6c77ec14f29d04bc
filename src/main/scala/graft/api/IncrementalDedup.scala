package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus deduplication against a PERSISTED fingerprint index —
  * the production 100 TB ingest shape: a continuously-fed pipeline dedups
  * each new increment against everything already ingested WITHOUT ever
  * rescanning the historical corpus. Only the fingerprint index (MinHash
  * LSH band keys, ~3 small columns per document × bands) is stored and
  * joined; the historical text never moves again.
  *
  * Index layout (mirrors `streaming.IncrementalAgg`'s versioned-state
  * pattern, adapted to append-only data):
  *
  * {{{
  *   root/seg00000/bkt=0/…/bkt=63/  parquet (id, band, bv) hash-bucketed
  *   root/seg00001/bkt=…/           next batch, same bucketing, ...
  *   root/_MANIFEST(.vN)            shared StateManifest (atomic pointer + history)
  * }}}
  *
  * Segments are PARTITIONED by `bkt = pmod(hash(band, bv), IndexBuckets)`
  * — every row of one (band, bv) bucket lands in one `bkt=` directory — so
  * an ingest reads only the index directories whose bkt values its
  * increment touches (directory-level partition pruning, pinned in
  * `MaintenanceSpec`). At production scale with a large history and small
  * increments that is the difference between reading touched buckets and
  * rescanning the whole index; raise [[IndexBuckets]] with corpus size so
  * a typical increment touches a minority of buckets.
  *
  * [[ingest]] is write-then-point: the increment's bands land in a new
  * segment directory FIRST, the returned decision frame reads only
  * already-written parquet (stable under later appends — no lazy recompute
  * hazard), and the manifest advances last via atomic rename.
  * A crash between write and point leaves an orphan directory that is
  * never read — readers see either the old or the new index, never a torn
  * one. On a real deployment the segment list is a Delta/Iceberg table and
  * `ingest` is one transaction.
  *
  * Semantics: an increment document is a duplicate iff it shares ≥1 LSH
  * band bucket with any SMALLER-ID document already present (prior
  * segments or the same increment) — the order is GLOBAL STRICT ID order,
  * `keep(b) ⟺ ¬∃ a < b sharing a bucket`, NOT segment arrival order.
  * That choice is what makes the pipeline replayable and idempotent: the
  * incremental decisions equal one whole-corpus batch query over the
  * union (the `q_incr_dedup` DuckDB oracle and the prefix-parity /
  * cut-point-independence tests in `MaintenanceSpec`), and a crash-window
  * double-append of the same ids provably changes no verdict
  * (`StreamingSpec`). The CONTRACT that makes id order meaningful:
  * callers assign ids monotonically with ingest order (ingest-time
  * sequence, snowflake-style ids — what a production feed does anyway).
  * A caller violating it (say content-hash ids) still gets the exact
  * replayable semantics above, but "first copy" then means LOWEST ID, not
  * first-arrived: a later increment carrying a smaller id than its
  * already-kept near-copy keeps TOO (its prior was never seen when the
  * larger id decided) — dedup against ids not yet ingested is impossible
  * without retro-revoking earlier decisions, which nothing downstream of
  * an already-emitted keep can do. Dropped documents' fingerprints are
  * still appended — future increments must dedup against the first-seen
  * copy AND its near-copies.
  *
  * Scale: per-ingest cost is one bucket equi-join of the increment's bands
  * against the index — ∝ |increment| + touched index buckets, never
  * ∝ corpus. [[BucketCap]] flood-guards degenerate buckets the same way
  * the batch path does (the census is over index ∪ increment at ingest
  * time; a bucket crossing the cap mid-history is excluded from that
  * ingest onward).
  */
object IncrementalDedup {

  /** Hash-bucket partitions per segment. A deployment sizes this so one
    * increment touches a minority of buckets (e.g. 4096 at 10^10 docs);
    * the value is baked into the on-disk layout, so changing it requires
    * an index rebuild. */
  val IndexBuckets = 64

  private def bktCol = pmod(hash(col("band"), col("bv")), lit(IndexBuckets))

  /** Live segment directory names, in ingest order — from the shared
    * [[StateManifest]] (round 13: the `_SEGMENTS` list, IncrementalAgg's
    * pointer pair, and MaterializedView's alternation now share ONE
    * manifest code path). A pre-manifest state dir decodes through the
    * legacy `_SEGMENTS` file read-only; the first ingest after an upgrade
    * commits a manifest carrying the same list. */
  def segments(root: String): Seq[String] =
    StateManifest.current(root).map(_.segments).getOrElse(legacySegments(root))

  private def legacySegments(root: String): Seq[String] = {
    val p = java.nio.file.Paths.get(root).resolve("_SEGMENTS")
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
  }

  /** Time-travel read: the index as of manifest commit `version` — valid
    * until [[vacuum]] reclaims segments the current manifest no longer
    * references (production: a retention window). Replay tests read the
    * pre-compaction index through this. */
  def indexAt(spark: SparkSession, root: String, version: Long): Option[DataFrame] =
    StateManifest.at(root, version).flatMap { m =>
      val allOnDisk = m.segments.forall(sg =>
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, sg)))
      if (m.segments.isEmpty || !allOnDisk) None // vacuumed past this version
      else Some(m.segments.map(sg => spark.read.parquet(s"$root/$sg"))
        .reduce(_.unionByName(_)).select("id", "band", "bv"))
    }

  /** The stored fingerprint index (id, band, bv), or None before any
    * ingest. The physical `bkt` partition column is an internal layout
    * detail and is projected away here. */
  def index(spark: SparkSession, root: String): Option[DataFrame] =
    rawIndex(spark, root).map(_.select("id", "band", "bv"))

  /** Like [[index]] but keeps the `bkt` partition column for pruned reads.
    * Each segment is its own partitioned table root, so segments load
    * separately and union (one multi-root read would make partition
    * discovery reject the conflicting directory structures); pruning
    * predicates push through the Union into every segment's scan. */
  private def rawIndex(spark: SparkSession, root: String): Option[DataFrame] = {
    val segs = segments(root)
    if (segs.isEmpty) None
    else Some(segs.map(sg => spark.read.parquet(s"$root/$sg")).reduce(_.unionByName(_)))
  }

  /** Ingest one increment: append its band keys `(id, band, bv)` (from
    * [[TextDedup.minhashBands]]) as a new index segment and return the
    * per-document decision frame
    *
    * {{{ (doc_id, n_prior BIGINT, keep BOOLEAN) }}}
    *
    * where `n_prior` counts distinct earlier documents sharing ≥1 band
    * bucket and `keep ⟺ n_prior = 0`. The decision frame is lazy and
    * entirely parquet-backed — evaluating it later (or never: an initial
    * history bootstrap can ignore it and pay only the segment write) is
    * safe regardless of subsequent ingests.
    *
    * Coverage contract: decisions cover exactly the document ids PRESENT
    * in `incBands`. A document yielding no fingerprints (shorter than the
    * shingle width) never appears here and trivially keeps — it has
    * nothing to collide on. Callers that own the full document set
    * compensate with a left join defaulting to (n_prior=0, keep=true)
    * ([[graft.streaming.StreamIncrDedup.ingestBatch]] and the
    * `q_incr_dedup` oracle row both do). An increment with zero bands is
    * legal: it writes an empty (orphaned, vacuumable) segment, returns an
    * empty frame, and leaves the index untouched. */
  /** Next unused segment name: one past the highest `seg*` directory ON
    * DISK — not the live-list length, because [[compactIndex]] shrinks the
    * list while orphan directories linger until [[vacuum]], and a name
    * collision with an orphan would fail the ingest write. */
  private def nextSegName(root: String): String = {
    val existing = Option(new java.io.File(root).list())
      .getOrElse(Array.empty[String]).filter(_.matches("seg\\d{5}"))
    val next = if (existing.isEmpty) 0 else existing.map(_.drop(3).toInt).max + 1
    f"seg$next%05d"
  }

  /** Allocate and atomically CLAIM the next segment directory. The layout
    * protocol is single-writer; should a second writer race anyway (a
    * misconfigured deployment, a duplicate scheduler firing the same
    * ingest twice), both may compute the same name — the atomic
    * createDirectory makes the loser fail loudly instead of the two
    * interleaving files inside one segment. (A race where the loser scans
    * AFTER the claim gets the next number and degrades to a consistent
    * orphan: the manifest commit is optimistic ([[StateManifest.commitIf]]),
    * so exactly one of two racing commits wins and vacuum reclaims the
    * loser's directory — never a torn index. True multi-writer ingest
    * belongs in a transaction-log service; see the class doc.) The claimed
    * directory already existing is why the Spark writes below use
    * mode=overwrite. */
  private def claimSeg(root: String): String = {
    val name = nextSegName(root)
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(root).resolve(name))
    name
  }

  /** Per-root writer/vacuum arbitration: [[ingest]] and [[compactIndex]]
    * hold the READ side from segment claim through manifest commit;
    * [[vacuum]] holds the WRITE side. Vacuum's not-in-live-list scan
    * cannot distinguish a crash orphan from a segment an IN-FLIGHT writer
    * has claimed but not yet committed — unserialized, it would delete
    * data whose manifest commit lands moments later, leaving a live list
    * pointing at a vanished directory. In-process only, matching the
    * documented maintenance contract (cross-process, vacuum keeps the
    * Delta-VACUUM single-maintainer role and a retention window). */
  private val rootLocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.locks.ReentrantReadWriteLock]()
  private def lockFor(root: String) =
    rootLocks.computeIfAbsent(
      java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString,
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())
  private def withLock[T](l: java.util.concurrent.locks.Lock)(f: => T): T = {
    l.lock(); try f finally l.unlock()
  }

  def ingest(spark: SparkSession, root: String, incBands: DataFrame,
      maxBucket: Int = 10000, distinctCensus: Boolean = false): DataFrame =
      withLock(lockFor(root).readLock()) {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val cur0 = StateManifest.current(root)
    val prior = cur0.map(_.segments).getOrElse(legacySegments(root))
    val segName = claimSeg(root)
    // cluster by bkt before the partitioned write: without it every write
    // task emits one file PER bucket it holds (tasks × buckets files — ~2k
    // tiny files per segment at 32 shuffle partitions; measured 28s/query
    // at sf0.1, all committer/footer overhead). Clustered, a segment is
    // ≤ IndexBuckets files — the layout a 1000-executor ingest wants too:
    // file count scales with the bucket count, not the task count.
    def sub[T](name: String)(body: => T): T =
      if (!sys.env.contains("GRAFT_INCR_DEDUP_SUBPROFILE")) body
      else {
        val t0 = System.nanoTime()
        val r = body
        System.err.println(
          f"[incr-dedup-sub] $name ${(System.nanoTime() - t0) / 1e9}%.3fs")
        r
      }
    val incProjected = incBands.select("id", "band", "bv").withColumn("bkt", bktCol)
    sub("seg_write") { incProjected.repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$root/$segName") }

    // explicit schema: an increment can legitimately carry ZERO bands (a
    // micro-batch of documents all shorter than the shingle width writes
    // an empty segment) and schema inference over an empty directory
    // throws — which in the streaming path would crash BEFORE the batch
    // ledger records, a permanent replay-crash loop on realistic input
    val segSchema = incProjected.schema
    val inc = spark.read.schema(segSchema).parquet(s"$root/$segName")
    // directory-level pruning: the index join only needs the bkt
    // partitions this increment touches. The touched set is ≤ IndexBuckets
    // values (model-sized collect), and bkt is a function of (band, bv),
    // so untouched partitions cannot contain a matching bucket — neither
    // for the join nor for the flood-guard census.
    val touched = sub("touched_census") { inc.select("bkt").distinct().collect()
      .map(r => Integer.valueOf(r.getInt(0))).toSeq }
    val stored = if (prior.isEmpty) None
                 else Some(prior.map(sg => spark.read.schema(segSchema).parquet(s"$root/$sg"))
                   .reduce(_.unionByName(_))
                   .where(col("bkt").isin(touched: _*)))
    // one frame, tagged by origin, so the flood-guard census and both join
    // sides share a single computed stage (same discipline as the batch path)
    val all = stored match {
      case Some(idx) => idx.withColumn("__new", lit(0)).unionByName(inc.withColumn("__new", lit(1)))
      case None => inc.withColumn("__new", lit(1))
    }
    // census mode: on a clean index the row census and the distinct-id
    // census are identical (one row per (id, band) by construction), and
    // the row census is cheaper (map-side count, no distinct exchange —
    // measured ~2 s/query at sf0.1). A caller whose index MAY carry exact
    // duplicate rows — the streaming ingest's crash-window replay
    // (StreamIncrDedup) — opts into the distinct census so inflated row
    // counts cannot tip a bucket over the cap; duplicates then cannot
    // affect anything (strict id < match, distinct prior-count, distinct
    // flood guard).
    val capped = BucketCap.cap(all, Seq("band", "bv"), maxBucket,
      distinctOn = if (distinctCensus) Some("id") else None)
    val x = capped.as("x")
    val y = capped.where(col("__new") === 1).as("y")
    val hits = x.join(y,
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .groupBy(col("y.id").as("doc_id"))
      .agg(count_distinct(col("x.id")).as("n_prior"))
    val decisions = inc.select(col("id").as("doc_id")).distinct()
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        col("n_prior").isNull.as("keep"))

    // an empty segment carries no information: leave it OFF the live list
    // (the claimed directory becomes a vacuumable orphan) so index readers
    // never meet a file-less directory. Commit through the shared
    // manifest: segment list + schema fingerprint move in one atomic
    // rename, and a recorded fingerprint that no longer matches the
    // increment refuses loudly instead of interleaving incompatible
    // parquet under one root.
    if (touched.nonEmpty) {
      val fp = StateManifest.schemaFingerprint(segSchema)
      cur0.map(_.schemaFp).filter(f => f.nonEmpty && f != fp).foreach { f =>
        throw new IllegalStateException(
          s"index schema drift at $root: manifest=$f increment=$fp")
      }
      // optimistic commit: a MAINTENANCE commit (compaction) racing this
      // ingest preserves the index CONTENT, so the decisions stay valid —
      // on conflict, re-read the advanced manifest, RE-CHECK schema drift
      // against it (a racing writer may have recorded a fingerprint cur0
      // never saw), and append this segment to ITS live list. Under the
      // old last-write-wins pointer one of the two lists was dropped.
      var cur = cur0
      var attempts = 0
      while (StateManifest.commitIf(root,
          cur.map(_.version),
          cur.map(_.segments).getOrElse(prior) :+ segName,
          cur.map(_.lastBatch).getOrElse(-1L), fp).isEmpty) {
        attempts += 1
        if (attempts > 20) throw new IllegalStateException(
          s"ingest at $root could not commit after $attempts conflicts")
        val next = StateManifest.current(root)
        next.map(_.schemaFp).filter(f => f.nonEmpty && f != fp).foreach { f =>
          throw new IllegalStateException(
            s"index schema drift at $root: manifest=$f increment=$fp")
        }
        if (next.map(_.version) == cur.map(_.version)) {
          // version did not advance: the blocker is an INCOMPLETE file on
          // the next version's name (a stale claim from the pre-link
          // protocol, or a torn external write) — under the link protocol
          // a live racer's commit always advances the version. Waiting
          // cannot help — reclaim it to restore liveness. Safe against
          // every live writer: reclaimOrphans deletes only
          // parse-incomplete files, and a commit only ever appears as a
          // complete file (atomic link), so nothing reclaimed can be or
          // become a commit.
          Thread.sleep(100L * math.min(attempts, 5))
          if (StateManifest.current(root).map(_.version) == cur.map(_.version))
            StateManifest.reclaimOrphans(root)
        }
        cur = StateManifest.current(root)
      }
    }
    decisions
  }

  /** Compact all live segments into ONE consolidated segment and point
    * `_SEGMENTS` at it. Pure layout maintenance: the merged segment holds
    * exactly the union of the live rows (same `bkt` values — `bkt` is a
    * function of the data, so no re-hash), and every subsequent ingest
    * decision is unchanged — `q_incr_dedup` runs a compact MID-SEQUENCE
    * and still hash-matches the whole-corpus oracle.
    *
    * Why it matters at scale: without compaction an ingest-per-hour index
    * accumulates one directory tree per ingest, and a pruned read costs
    * O(#segments) file opens per touched bucket. Compacted, each `bkt=`
    * directory holds ONE file again, so pruned-read cost returns to
    * O(touched buckets) no matter how many ingests preceded. Same
    * write-then-point discipline as [[ingest]]: readers see the old or the
    * new list, never a torn one. Old directories become orphans — still
    * readable by decision frames created BEFORE the compact — and are
    * reclaimed later by [[vacuum]]; production maps this to a retention
    * window (vacuum only segments older than the longest-running reader).
    *
    * Returns the new segment name; None when ≤1 segment is live or when
    * a concurrent ingest advanced the manifest mid-compaction (the
    * optimistic commit aborts rather than dropping the fresh segment —
    * re-run on the new snapshot). */
  def compactIndex(spark: SparkSession, root: String): Option[String] =
      withLock(lockFor(root).readLock()) {
    val cur = StateManifest.current(root)
    val prior = cur.map(_.segments).getOrElse(legacySegments(root))
    if (prior.size <= 1) None
    else {
      val segName = claimSeg(root)
      prior.map(sg => spark.read.parquet(s"$root/$sg")).reduce(_.unionByName(_))
        // drop exact row duplicates: a crash-window replay of a streaming
        // ingest (StreamIncrDedup) can double-append a batch's fingerprints,
        // which never changes a verdict but inflates the flood-guard's
        // row-count census — compaction is where the true census is restored
        .dropDuplicates("id", "band", "bv")
        .repartition(col("bkt"))
        .write.mode("overwrite").partitionBy("bkt").parquet(s"$root/$segName")
      // optimistic commit: if an ingest advanced the manifest while this
      // compaction ran, committing the stale snapshot would DROP the fresh
      // segment from the live list — abort instead (the claimed directory
      // becomes a vacuumable orphan) and let the caller retry on the new
      // snapshot. Maintenance must never lose an ingest the race.
      StateManifest.commitIf(root, cur.map(_.version), Seq(segName),
        cur.map(_.lastBatch).getOrElse(-1L),
        cur.map(_.schemaFp).getOrElse("")).map(_ => segName)
    }
  }

  /** Delete segment directories no longer referenced by the CURRENT
    * manifest (the orphans left by [[compactIndex]], an aborted optimistic
    * commit, or a crash between segment write and manifest advance).
    * Destroys data that lazy decision frames created before the compact
    * may still reference — run it only after those are evaluated
    * (production: after a retention window). Manifest history versions
    * that reference a vacuumed segment are pruned too, so [[indexAt]]
    * answers None for them instead of failing at evaluation time.
    * Returns the deleted segment names. */
  def vacuum(root: String): Seq[String] =
      withLock(lockFor(root).writeLock()) {
    val live = segments(root).toSet
    val dir = java.nio.file.Paths.get(root)
    val orphans = Option(dir.toFile.list()).getOrElse(Array.empty[String])
      .filter(n => n.matches("seg\\d{5}") && !live.contains(n)).toSeq.sorted
    orphans.foreach(n => AtomicFiles.rmTree(dir.resolve(n)))
    if (orphans.nonEmpty) {
      val gone = orphans.toSet
      val cur = StateManifest.current(root).map(_.version).getOrElse(-1L)
      StateManifest.versions(root)
        .filter(v => v != cur && StateManifest.at(root, v)
          .exists(_.segments.exists(gone.contains)))
        .foreach(v => java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(root).resolve(s"_MANIFEST.v$v")))
    }
    orphans
  }
}
