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

  test("ModelStore: persisted fit is bit-identical and a fresh process loads, not re-fits") {
    import graft.api.ModelStore
    val root = java.nio.file.Files.createTempDirectory("graft-ms").toString
    val d = sf("sf0.001")
    var fits = 0
    def fit() = { fits += 1
      VectorSearch.ivfFitKMeans(normed(d), nCells = 8, iters = 2) }
    val first = ModelStore.matrix(root, "spec-ivf-8")(fit())
    assert(fits == 1)
    // a NEW process has an empty ModelCache but the same store: the load
    // path must serve the identical model without invoking the fit
    val loaded = ModelStore.matrix(root, "spec-ivf-8")(fit())
    assert(fits == 1, "persisted model must be loaded, not re-fit")
    assert(loaded.length == first.length)
    loaded.zip(first).foreach { case (l, f) =>
      assert(l.sameElements(f), "persisted != fresh (raw-bits round-trip broken)") }
    // negative components / -0.0 / seeds with full mantissas all round-trip
    // through the raw-bits codec exactly
    first.iterator.flatten.zip(loaded.iterator.flatten).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToRawLongBits(a)
        == java.lang.Double.doubleToRawLongBits(b)) }
  }

  test("ModelStore: codebooks (3-D) round-trip; a corrupt artifact re-fits") {
    import graft.api.ModelStore
    val root = java.nio.file.Files.createTempDirectory("graft-ms3").toString
    val d = sf("sf0.001")
    var fits = 0
    def fit() = { fits += 1
      ProductQuant.fit(normed(d), m = 2, subDim = 32, k = 4, iters = 1) }
    val first = ModelStore.cube(root, "spec-pq")(fit())
    val loaded = ModelStore.cube(root, "spec-pq")(fit())
    assert(fits == 1, "persisted codebooks must load, not re-fit")
    for (s0 <- first.indices; c <- first(s0).indices)
      assert(loaded(s0)(c).sameElements(first(s0)(c)))
    // corrupt the committed artifact in place: the parse treats it as
    // ABSENT and the next read re-fits + commits a NEW manifest version
    val cur = graft.api.StateManifest.current(s"$root/spec-pq").get
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      s"$root/spec-pq/${cur.segments.head}/model.txt"), "books=garbage")
    val refit = ModelStore.cube(root, "spec-pq")(fit())
    assert(fits == 2, "corrupt artifact must re-fit")
    for (s0 <- first.indices; c <- first(s0).indices)
      assert(refit(s0)(c).sameElements(first(s0)(c)), "re-fit differs (determinism)")
    val v2 = graft.api.StateManifest.current(s"$root/spec-pq").get
    assert(v2.version == cur.version + 1, "re-fit must commit a new version")
  }

  test("ModelStore: negative / absurd counts in a corrupt header re-fit, never crash") {
    import graft.api.ModelStore
    val root = java.nio.file.Files.createTempDirectory("graft-msc").toString
    var fits = 0
    def fit() = { fits += 1; Array(Array(1.0, 2.0)) }
    ModelStore.matrix(root, "k")(fit())
    assert(fits == 1)
    def segFile() = {
      val cur = graft.api.StateManifest.current(s"$root/k").get
      java.nio.file.Paths.get(s"$root/k/${cur.segments.head}/model.txt")
    }
    // rows=-1 would NegativeArraySizeException and rows=2000000000 would
    // attempt an OOM-sized allocation if counts reached `new Array` raw;
    // both must parse as ABSENT -> refit + new manifest version
    for (corrupt <- Seq("rows=-1\n", s"rows=${Int.MaxValue}\n")) {
      java.nio.file.Files.writeString(segFile(), corrupt)
      val before = fits
      val m = ModelStore.matrix(root, "k")(fit())
      assert(fits == before + 1, s"header '$corrupt' must re-fit")
      assert(m(0).sameElements(Array(1.0, 2.0)))
    }
  }

  test("ModelStore: type tag mismatch is a miss, not a mis-parse") {
    import graft.api.ModelStore
    val root = java.nio.file.Files.createTempDirectory("graft-mst").toString
    val m = ModelStore.matrix(root, "k")(Array(Array(1.5, -0.0)))
    assert(java.lang.Double.doubleToRawLongBits(m(0)(1))
      == java.lang.Double.doubleToRawLongBits(-0.0))
    // same key, cube type: the schemaFp tag differs -> treated as a miss
    // (never parse matrix bytes as a cube); the fresh cube commits as the
    // next manifest version
    val c = ModelStore.cube(root, "k")(Array(Array(Array(2.0))))
    assert(c(0)(0)(0) == 2.0)
    assert(graft.api.StateManifest.current(s"$root/k").get.schemaFp == "cube")
  }

  test("above-budget broadcast cache evicts beyond its bound; evicted handles stay usable") {
    // 6 distinct model arrays through the identity-keyed LRU (cap 4):
    // the two least-recently-used entries evict via unpersist — executor
    // blocks freed, but the HANDLE must stay usable (a lazy plan built
    // before eviction re-ships from the driver block; destroy() here
    // would fail that plan at evaluation). A re-request of an evicted
    // model mints a FRESH broadcast, and a still-cached model returns the
    // SAME handle object (IvfArgmaxBc's reference-identity equality
    // depends on that reuse).
    val models = (0 until 6).map(i =>
      Array.tabulate(4, 8)((r, c) => (i * 100 + r * 10 + c).toDouble))
    val handles = models.map(m => VectorSearch.modelBroadcast(spark, m))
    // evicted but NOT destroyed: value re-fetches from the driver block
    assert(handles(0).value.cents(0)(0) == 0.0)
    assert(handles(1).value.cents(0)(0) == 100.0)
    val re = VectorSearch.modelBroadcast(spark, models(0))
    assert(re.id != handles(0).id, "evicted model must get a fresh broadcast")
    assert(re.value.cents.length == 4)
    assert(VectorSearch.modelBroadcast(spark, models(5)) eq handles(5),
      "cached model must hand back the identical broadcast object")
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
