package graft.api

/** One committed snapshot of a versioned state directory. */
final case class Manifest(
    version: Long,         // monotonically increasing commit number
    segments: Seq[String], // live data directories under root, in order
    lastBatch: Long,       // idempotence ledger (-1 = no batch applied)
    schemaFp: String)      // fingerprint of the stored schema ("" = unset)

/** THE single manifest format for every versioned-parquet state directory
  * in the engine — the credible Delta/Iceberg stand-in SCALE.md §C
  * promises. Before round 13, [[IncrementalDedup]]'s `_SEGMENTS` list,
  * [[graft.streaming.IncrementalAgg]]'s `_CURRENT`+`_LAST_BATCH` pointer
  * pair, and [[MaterializedView.refresh]]'s `_CURRENT` alternation were
  * three bespoke commit formats — three crash matrices to test. They now
  * share this one code path.
  *
  * Layout:
  * {{{
  *   root/_MANIFEST        current manifest (atomic pointer — AtomicFiles)
  *   root/_MANIFEST.v<N>   immutable history, one file per commit
  * }}}
  *
  * Commit protocol: data directories are written FIRST by the caller,
  * then [[commit]] writes the immutable history file and finally renames
  * the `_MANIFEST` pointer into place atomically. A crash at any point
  * leaves either the old or the new manifest current — never a torn one;
  * data written for an uncommitted manifest is an unreachable orphan
  * (vacuumable). Folding the batch ledger INTO the manifest closes the
  * old crash window between a `_CURRENT` advance and a separate
  * `_LAST_BATCH` advance: version, segment list, and ledger now move in
  * ONE atomic rename.
  *
  * Time travel: [[at]] reads any retained history version — replay tests
  * read the state as of an earlier commit. Whether the DATA of an old
  * version is still on disk is the caller's retention policy
  * (IncrementalDedup keeps superseded segments until `vacuum`;
  * IncrementalAgg retains the previous data version alongside the
  * current one).
  *
  * The schema fingerprint makes layout drift loud: a writer whose data
  * schema no longer matches the manifest's recorded fingerprint must
  * refuse to commit on top of it rather than interleave incompatible
  * parquet under one root.
  */
object StateManifest {

  /** Fingerprint of the stored schema, with DECIMAL precision/scale
    * erased: associative merges legitimately widen decimals batch over
    * batch (sum(decimal(18,6)) → 28,6 → 38,6 before capping), and parquet
    * reads reconcile those — only a name/arity/base-type change is real
    * layout drift. */
  def schemaFingerprint(schema: org.apache.spark.sql.types.StructType): String =
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        schema.catalogString.replaceAll("decimal\\(\\d+,\\d+\\)", "decimal")))

  private def ptr(root: String) =
    java.nio.file.Paths.get(root).resolve("_MANIFEST")
  private def hist(root: String, v: Long) =
    java.nio.file.Paths.get(root).resolve(s"_MANIFEST.v$v")

  private def render(m: Manifest): String =
    (Seq(s"version=${m.version}", s"lastBatch=${m.lastBatch}",
      s"schemaFp=${m.schemaFp}") ++ m.segments.map(s => s"seg=$s"))
      .mkString("", "\n", "\n")

  private def parse(text: String): Manifest = {
    val kv = text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }.toSeq
    Manifest(
      version = kv.collectFirst { case ("version", v) => v.toLong }.getOrElse(0L),
      segments = kv.collect { case ("seg", s) => s },
      lastBatch = kv.collectFirst { case ("lastBatch", v) => v.toLong }.getOrElse(-1L),
      schemaFp = kv.collectFirst { case ("schemaFp", v) => v }.getOrElse(""))
  }

  /** The current manifest, or None before the first commit. */
  def current(root: String): Option[Manifest] = {
    val p = ptr(root)
    if (java.nio.file.Files.exists(p))
      Some(parse(java.nio.file.Files.readString(p)))
    else None
  }

  /** Time-travel read: the manifest as of commit `version`, if retained. */
  def at(root: String, version: Long): Option[Manifest] = {
    val p = hist(root, version)
    if (java.nio.file.Files.exists(p))
      Some(parse(java.nio.file.Files.readString(p)))
    else None
  }

  /** All retained history versions, ascending. */
  def versions(root: String): Seq[Long] =
    Option(new java.io.File(root).list()).getOrElse(Array.empty[String])
      .flatMap { n =>
        if (n.startsWith("_MANIFEST.v")) n.drop("_MANIFEST.v".length).toLongOption
        else None
      }.toSeq.sorted

  /** Commit a new manifest (version = current + 1): immutable history
    * file first, then the atomic pointer rename. The caller has already
    * written every data directory in `segments`. SINGLE-WRITER commit:
    * a crashed prior attempt's orphan history file is silently reclaimed
    * (overwritten) — use [[commitIf]] when writers can race. */
  def commit(root: String, segments: Seq[String], lastBatch: Long,
      schemaFp: String): Manifest = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val next = Manifest(current(root).map(_.version + 1).getOrElse(0L),
      segments, lastBatch, schemaFp)
    // a crashed prior attempt may have left this history file — it was
    // never pointed at, so overwriting it is reclaiming an orphan
    java.nio.file.Files.writeString(hist(root, next.version), render(next))
    AtomicFiles.writePointer(ptr(root), render(next))
    next
  }

  /** Optimistic (compare-and-swap) commit: succeeds only if the current
    * manifest version still equals `expected` (None = no manifest yet)
    * AND this writer wins the exclusive claim on the next history file.
    * Returns None on conflict — the caller re-reads the current manifest
    * and decides whether its work is still valid (the Delta/Iceberg
    * optimistic-concurrency shape).
    *
    * Why it exists: a maintenance commit racing an ingest commit under
    * plain [[commit]] would last-write-win the pointer and silently DROP
    * the other writer's segment from the live list. Under commitIf
    * exactly one of the two wins; the loser observes the conflict.
    *
    * Liveness: a writer that crashed between claim and pointer leaves an
    * orphan history file that blocks its version number. When the
    * current version has provably not advanced and no writer is live
    * (the same assumption [[IncrementalDedup.vacuum]] already makes),
    * [[reclaimOrphans]] deletes history files above the pointer and
    * restores progress. */
  def commitIf(root: String, expected: Option[Long], segments: Seq[String],
      lastBatch: Long, schemaFp: String): Option[Manifest] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    if (current(root).map(_.version) != expected) return None
    val next = Manifest(expected.map(_ + 1).getOrElse(0L),
      segments, lastBatch, schemaFp)
    val h = hist(root, next.version)
    try java.nio.file.Files.createFile(h)
    catch { case _: java.nio.file.FileAlreadyExistsException => return None }
    java.nio.file.Files.writeString(h, render(next))
    AtomicFiles.writePointer(ptr(root), render(next))
    Some(next)
  }

  /** Delete orphan history files ABOVE the current pointer (crashed
    * [[commitIf]] claims). Only safe when no writer is live — the
    * caller's retention/maintenance window, like vacuum. Returns the
    * reclaimed version numbers. */
  def reclaimOrphans(root: String): Seq[Long] = {
    val cur = current(root).map(_.version).getOrElse(-1L)
    val orphans = versions(root).filter(_ > cur)
    orphans.foreach(v => java.nio.file.Files.deleteIfExists(hist(root, v)))
    orphans
  }
}
