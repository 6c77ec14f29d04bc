package graft

import graft.api.{ModelCache, ProductQuant, VectorSearch}
import org.apache.spark.sql.functions._

/** The fingerprint-keyed fit cache must be invisible to results: a cached
  * model is bit-identical to a fresh fit of the same data, the key moves
  * when the source data changes, and a copied bootstrap directory is
  * byte-identical to its source. */
class ModelCacheSpec extends SparkSpec {

  private def normed(d: String) =
    VectorSearch.withNorm(Tables.embeddings(spark, d),
      col("vec_id"), col("embedding"), col("label"))

  test("cached IVF centroids are bit-identical to a fresh fit") {
    val d = sf("sf0.001")
    val fresh = VectorSearch.ivfFitKMeans(normed(d), nCells = 8, iters = 2)
    val key = s"spec-ivf:${ModelCache.fingerprint(d, "embeddings")}"
    val cached = ModelCache.cached(key)(
      VectorSearch.ivfFitKMeans(normed(d), nCells = 8, iters = 2))
    val again = ModelCache.cached(key)(
      sys.error("cache miss on second read"): Array[Array[Double]])
    assert(cached.length == fresh.length)
    cached.zip(fresh).foreach { case (c, f) => assert(c.sameElements(f)) }
    assert(again eq cached, "second read must return the cached instance")
  }

  test("cached PQ codebooks are bit-identical to a fresh fit") {
    val d = sf("sf0.001")
    val fresh = ProductQuant.fit(normed(d), m = 4, subDim = 16, k = 8, iters = 2)
    val key = s"spec-pq:${ModelCache.fingerprint(d, "embeddings")}"
    val cached = ModelCache.cached(key)(
      ProductQuant.fit(normed(d), m = 4, subDim = 16, k = 8, iters = 2))
    assert(cached.length == fresh.length)
    for (s0 <- cached.indices; c <- cached(s0).indices)
      assert(cached(s0)(c).sameElements(fresh(s0)(c)),
        s"sub=$s0 cell=$c differs")
  }

  test("fingerprint moves when any source file's size or mtime changes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fp").toString
    val f = java.nio.file.Paths.get(tmp, "documents.parquet")
    java.nio.file.Files.writeString(f, "v1")
    val fp1 = ModelCache.fingerprint(tmp, "documents")
    java.nio.file.Files.writeString(f, "v2-longer")
    val fp2 = ModelCache.fingerprint(tmp, "documents")
    assert(fp1 != fp2, "size change must move the fingerprint")
    assert(ModelCache.fingerprint(tmp, "documents") == fp2, "stable otherwise")
  }

  test("copyTree reproduces a directory byte-for-byte and isolates mutation") {
    val src = java.nio.file.Files.createTempDirectory("graft-ct-src")
    java.nio.file.Files.createDirectories(src.resolve("seg-0/bkt=3"))
    java.nio.file.Files.writeString(src.resolve("seg-0/bkt=3/part-0.parquet"), "DATA")
    java.nio.file.Files.writeString(src.resolve("_SEGMENTS"), "seg-0\n")
    val dst = java.nio.file.Files.createTempDirectory("graft-ct-dst")
    ModelCache.copyTree(src.toString, dst.toString)
    assert(java.nio.file.Files.readString(dst.resolve("_SEGMENTS")) == "seg-0\n")
    assert(java.nio.file.Files.readString(
      dst.resolve("seg-0/bkt=3/part-0.parquet")) == "DATA")
    // mutating the copy must not touch the source
    java.nio.file.Files.writeString(dst.resolve("_SEGMENTS"), "seg-0\nseg-1\n")
    assert(java.nio.file.Files.readString(src.resolve("_SEGMENTS")) == "seg-0\n")
  }
}
