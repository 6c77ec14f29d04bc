package graft

import graft.api.{TextDedup, TextProfile, VectorSearch}
import org.apache.spark.sql.functions._

/** The public library API on arbitrary user DataFrames — the "switch to
  * this library" surface (schemas unrelated to the test tables). */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // near-dup of 1
    (3L, "completely different content about spark engines and catalyst planning rules"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("article_id", "body")

  test("TextDedup end-to-end on a user schema") {
    val exact = TextDedup.exact(docs, col("article_id"), col("body")).collect()
    assert(exact.length == 3)
    assert(exact.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))

    val hashes = TextDedup.shingleHashes(docs, col("article_id"), col("body"))
    val cand = TextDedup.candidatePairs(TextDedup.minhashBands(hashes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 4L)), "exact dup must share all bands")

    val verified = TextDedup.jaccardVerify(hashes,
        TextDedup.candidatePairs(TextDedup.minhashBands(hashes)), minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(verified((1L, 4L)) == 1.0)
    verified.get((1L, 2L)).foreach(j => assert(j > 0.5 && j < 1.0))

    val fp = TextDedup.simhash(docs, col("article_id"), col("body"))
    val pairs = TextDedup.simhashPairs(fp, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
  }

  test("TextProfile on a user schema") {
    val st = TextProfile.stats(docs, col("article_id"), col("body"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getAs[Int]("n_tokens") == 14)
    assert(st(1L).getAs[Double]("stop_ratio") > 0.2) // 'the' x3 + 'over'... of 13
    val fps = TextProfile.fingerprint(docs, col("article_id"), col("body"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(4L) && fps(1L) != fps(2L))
  }

  test("VectorSearch on a user schema") {
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.9f, 0.1f, 0.0f)),
      (12L, Array(0.0f, 1.0f, 0.0f)),
      (13L, Array(2.0f, 0.0f, 0.0f)) // colinear with 10
    ).toDF("item", "emb")
    val n = VectorSearch.withNorm(vecs, col("item"), col("emb"))
    val top = VectorSearch.topK(n, n.where(col("id") === 10L), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(top.toSeq == Seq((13L, 1, 1.0), (11L, 2, top(1)._3)))
    assert(top(1)._3 > 0.9)

    val dups = VectorSearch.nearDuplicates(n, block = lit(1), minCosine = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.toSeq == Seq((10L, 13L)))
  }
}
