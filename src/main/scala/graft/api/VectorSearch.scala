package graft.api

import graft.functions.{CrossHash, VectorExprs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public similarity-search API over arbitrary (id, vector) DataFrames.
  * Vectors are any numeric array column; everything computes in double with
  * the codegen'd [[graft.functions.DotProduct]].
  *
  * Scale shape: queries are broadcast against the partitioned corpus
  * (brute force), or both sides reduce to LSH bucket keys first (ANN) so
  * the join is an equi-join on an 8-bit key. At 100 TB the corpus never
  * shuffles for a search.
  */
object VectorSearch {

  /** Normalize input: (id, v ARRAY<DOUBLE>, nrm). */
  def withNorm(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("id"), transform(vec, x => x.cast("double")).as("v"))
      .withColumn("nrm", VectorExprs.l2_norm(col("v")))

  private def cosine(qv: Column, qn: Column, v: Column, n: Column): Column =
    VectorExprs.dot_product(qv, v) / (qn * n)

  /** Exact top-k cosine neighbors of each query vector (excluding self-id).
    * The query set is broadcast; corpus stays partitioned. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val cos = cosine(col("qv"), col("qn"), col("v"), col("nrm"))
    val scored = corpus.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"), cos.as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), round(col("cos"), 4).as("cos"))
  }

  /** Sign-LSH bucket signature per vector: (id, v, nrm, sig). `planes`
    * defaults to the engine's deterministic hyperplanes. */
  def signLsh(corpus: DataFrame, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = CrossHash.hyperplanes(nPlanes, dim)
    val spark = corpus.sparkSession
    import spark.implicits._
    val planesDf = planes.toSeq.zipWithIndex.map { case (h, p) => (p, h.toSeq) }
      .toDF("p", "h")
    val sig = corpus.join(broadcast(planesDf))
      .groupBy("id")
      .agg(sum(when(VectorExprs.dot_product(col("v"), col("h")) > 0,
        expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(0L)).as("sig"))
    corpus.join(sig, "id")
  }

  /** ANN top-k: exact cosine re-rank within the query's LSH bucket. */
  def annTopK(withSig: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"), col("sig").as("qsig"))
    val cos = cosine(col("qv"), col("qn"), col("v"), col("nrm"))
    val scored = withSig.join(broadcast(q),
        col("sig") === col("qsig") && col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"), cos.as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), round(col("cos"), 4).as("cos"))
  }

  /** Near-duplicate vector pairs above a cosine threshold, blocked by a
    * coarse partition column (label / cluster / LSH bucket) so the
    * self-join never goes all-pairs. */
  def nearDuplicates(corpus: DataFrame, block: Column, minCosine: Double): DataFrame = {
    val blocked = corpus.withColumn("__blk", block)
    val cos = cosine(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm"))
    blocked.as("a").join(blocked.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.id") < col("b.id"))
      .where(cos >= minCosine)
      .select(col("a.id").as("a"), col("b.id").as("b"), round(cos, 4).as("cos"))
  }
}
