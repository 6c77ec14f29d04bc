package graft.api

import java.util.concurrent.ConcurrentHashMap

/** Process-wide cache for DETERMINISTIC model fits (IVF centroids, PQ
  * codebooks, bootstrap index segments) keyed by a fingerprint of the
  * source data they derive from.
  *
  * Why: the ANN family re-runs the same Lloyd/PQ fits in every consumer
  * query (q_sim_ivf, q_ann_recall, q_kmeans_fit, q_ivfpq_ann,
  * q_annpq_recall, q_semantic_dedup all fit the identical 8-cell coarse
  * quantizer; q_pq_ann/q_ivfpq_ann/q_annpq_recall the identical PQ
  * codebooks). Each fit is a pure function of (source data, params), so
  * recomputing it per query is wasted corpus scans — exactly the pattern
  * [[graft.operators.LayoutOps]] already amortizes for bucketed layouts.
  * At 100 TB the same shape holds: a production deployment trains the
  * quantizer once per corpus snapshot and every search query reuses the
  * model; the per-query cost is assignment + candidate join, never the fit.
  *
  * Safety: the key embeds [[fingerprint]] — path + file length + mtime of
  * every source table — so a regenerated dataset can never be served a
  * stale model (the fingerprint moves, the fit re-runs). Entries live only
  * in this JVM; a new process re-fits, which `mode=overwrite` semantics at
  * the call sites make safe. Cached ≡ fresh is pinned by ModelCacheSpec.
  */
object ModelCache {

  /** Source-data fingerprint: dir + per-file sizes + mtimes of the
    * tables a model derives from. A table that is a DIRECTORY (Spark
    * multi-file parquet output) fingerprints its contained files by
    * (name, length, mtime) — `File.length` of a directory is a
    * filesystem constant and the directory mtime alone would miss a
    * part-file replaced with timestamp preservation. Used for cache
    * KEYING only — never in results. */
  def fingerprint(d: String, tables: String*): String = {
    def sig(f: java.io.File): String =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName)
          .map(c => s"${c.getName}:${c.length}:${c.lastModified}")
          .mkString(",")
      else s"${f.length}:${f.lastModified}"
    val parts = tables.map { t =>
      val f = new java.io.File(s"$d/$t.parquet")
      s"$t:${sig(f)}"
    }
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(d + parts.mkString("|")) & 0xffffffffL)
  }

  /** Collision-resistant directory-name stamp: the first 16 hex chars
    * (64 bits) of SHA-256(`s`). State-directory names derived from the
    * 32-bit `s.hashCode` can collide across distinct stamps (ADVICE r17)
    * — two (params, data-fingerprint) stamps then share ONE directory,
    * defeating the "regenerated data lands under a NEW directory"
    * invariant. 64 digest bits make an accidental collision practically
    * impossible at any plausible number of state roots. */
  def sha16(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString

  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Return the cached value for `key`, computing `fit` on first use.
    * `fit` must be a deterministic function of what `key` encodes. */
  def cached[T <: AnyRef](key: String)(fit: => T): T =
    cache.computeIfAbsent(key, _ => fit).asInstanceOf[T]

  /** Recursively copy a cached directory artifact into a fresh working
    * root. The cache keeps a pristine copy (e.g. a bootstrap index
    * segment); each consumer mutates its own copy, so cached state can
    * never leak between runs. */
  def copyTree(src: String, dst: String): Unit = {
    val s0 = java.nio.file.Paths.get(src)
    val d0 = java.nio.file.Paths.get(dst)
    val walk = java.nio.file.Files.walk(s0)
    try walk.forEach { p =>
      val t = d0.resolve(s0.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally walk.close()
  }

  /** Number of live entries (observability + specs). */
  def size: Int = cache.size

  /** Drop everything — spec isolation only. */
  def invalidate(): Unit = cache.clear()
}
