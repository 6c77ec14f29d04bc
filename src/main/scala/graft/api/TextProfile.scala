package graft.api

import graft.functions.CrossHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public text-analysis API: per-document statistics, quality scoring,
  * language heuristics, corpus term frequency and order-sensitive
  * fingerprinting over arbitrary (id, text) DataFrames. All per-row array
  * arithmetic (narrow, no shuffle) except the term-frequency groupBy.
  */
object TextProfile {

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** Per-doc raw stats: token counts, distinct ratio, stopword ratio,
    * BPE-ish subword estimate, quality score and a stopword-based language
    * guess. Ratios unrounded (callers round at their output boundary). */
  def stats(df: DataFrame, id: Column, text: Column,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    df.select(id.as("id"), text.as("text"), split(text, " ").as("w"))
      .select(
        col("id"),
        size(col("w")).as("n_tokens"),
        size(array_distinct(col("w"))).as("n_distinct"),
        (length(col("text")).cast("double") / size(col("w"))).as("avg_tok_len"),
        (size(filter(col("w"), x => array_contains(stopArr, x))).cast("double") /
          size(col("w"))).as("stop_ratio"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("ttr"),
        aggregate(
          transform(col("w"), x => ((length(x) + 3) / 4).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_bpe_tokens"))
      .withColumn("quality", (col("stop_ratio") * 2 + col("ttr")) / 3)
      .withColumn("lang_guess",
        when(col("stop_ratio") >= 0.02, "en").otherwise("other"))
  }

  /** Corpus term/document frequency: (word, tf, df). */
  def termFrequency(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"), explode(split(text, " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("tf"), countDistinct(col("id")).as("df"))

  /** Per-(doc, word) tf-idf: `tf · ln(N/df)`. Shuffle budget: one map-side-
    * combined groupBy on (id, word); document frequency is derived from the
    * tf frame (already one row per (doc, word) — far smaller than the raw
    * token stream), and the corpus size joins in as a broadcast scalar, so
    * nothing rescans or reshuffles the documents. */
  def tfidf(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tf = df.select(id.as("id"), explode(split(text, " ")).as("word"))
      .groupBy("id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(n))
      .select(col("id"), col("word"), col("tf"), col("df"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
  }

  /** Order-sensitive rolling-hash fingerprint per document. */
  def fingerprint(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("id"),
      aggregate(
        transform(split(text, " "), x => CrossHash.shingleHash(x)),
        lit(0L), (acc, h) => (acc * 131 + h) % CrossHash.P).as("fp"))
}
