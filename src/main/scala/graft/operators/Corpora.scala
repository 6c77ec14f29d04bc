package graft.operators

import graft.Tables
import graft.functions.CrossHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared inputs for the dedup / text-analysis operators.
  *
  * The driver's `documents` table has no duplicate texts, so the dedup
  * corpus derives them deterministically from the table itself (allowed:
  * same input parquet, pure column arithmetic — mirrored exactly in the
  * DuckDB oracle CTE):
  *   - exact copies  of every `doc_id % 7 == 0` (id + 2,000,000)
  *   - near-dup copies (first 90% of words) of `doc_id % 5 == 0`
  *     (id + 1,000,000)
  *
  * Tokenization is whitespace split; shingles are word 3-grams hashed to
  * 56-bit md5 ints reduced mod P (engine-portable, see [[graft.functions.CrossHash]]).
  */
object Corpora {

  /** Spark side of the dedup corpus. */
  def dedupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text", "lang")
    val exact = docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"), col("lang"))
    val near = docs.where(col("doc_id") % 5 === 0)
      .select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, greatest((size(split(text, ' ')) * 9) div 10, 1)), ' ')")
          .as("text"),
        col("lang"))
    docs.unionAll(exact).unionAll(near)
  }

  /** DuckDB CTE mirroring [[dedupCorpus]] (view name `corpus`). */
  val dedupCorpusCte: String =
    """corpus AS (
      |  SELECT doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000, text, lang FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |         array_to_string(string_split(text, ' ')[1:greatest((len(string_split(text, ' ')) * 9) // 10, 1)], ' '),
      |         lang
      |  FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin

  /** Distinct 3-gram shingle hashes per corpus doc: (doc_id, hv), hv < P.
    *
    * Persisted: this stage feeds MinHash signatures, banding, Jaccard
    * intersections and set sizes — up to 5 consumers in one plan, and Spark
    * has no cross-plan common-subexpression reuse. Materializing the
    * (doc_id, hash) stage once is the production dedup-pipeline shape (at
    * 100 TB this is a checkpointed intermediate table, ~16 bytes/shingle —
    * tiny next to the text it derives from). Identical logical plans hit
    * the same cache entry, so repeated calls don't double-cache. */
  def shingleHashes(s: SparkSession, d: String): DataFrame =
    shingleHashesUncached(s, d)
      .transform(graft.Persisting.maybe)

  /** Shingling via posexplode + window `lead` — deliberately NO
    * higher-order functions. A `transform(sequence(...), i -> ...w[i]...)`
    * formulation drops the whole projection out of codegen (HOFs are
    * interpreted) and Catalyst's project-collapsing re-inlines the token
    * split into the lambda, re-tokenizing per element; profiled 15-20×
    * slower and single-threaded. The window shuffle on doc_id also
    * distributes the hash work across all cores regardless of how few
    * input files the corpus arrives in. */
  private def shingleHashesUncached(s: SparkSession, d: String): DataFrame =
    graft.api.TextDedup
      .shingleHashes(dedupCorpus(s, d), col("doc_id"), col("text"), n = 3)
      .withColumnRenamed("id", "doc_id")

  /** DuckDB CTEs mirroring [[shingleHashes]] (view name `hd`); requires
    * `corpus` from [[dedupCorpusCte]]. */
  val shingleHashesCte: String =
    s"""tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
       |sh AS (
       |  SELECT doc_id,
       |         list_transform(range(1, len(w) - 1),
       |                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) AS shingles
       |  FROM tok
       |),
       |hd AS (
       |  SELECT DISTINCT doc_id, ${shingleHashSql("s")} AS hv
       |  FROM sh, unnest(shingles) AS u(s)
       |)""".stripMargin
}
