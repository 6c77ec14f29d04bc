package graft.operators

import graft.QueryDef
import graft.functions.CrossHash._
import org.apache.spark.sql.functions._

/** Deduplication suite (SURVEY.md §2.B north-star rows): exact, MinHash+LSH
  * banding, SimHash, and n-gram Jaccard verification — each designed as the
  * 100 TB-scale pipeline shape, not an all-pairs loop:
  *
  *   - exact dedup is one hash-aggregate on the content key (map-side
  *     combined; at scale, `text` would first be reduced to a digest so the
  *     shuffle carries 8-byte keys, which is exactly what grouping by the
  *     md5-derived key does here);
  *   - MinHash: per-doc signatures are one explode + one groupBy (16 `min`
  *     aggregates, map-side combined), candidates come from a shuffle join
  *     on (band, band-hash) buckets — never an all-pairs product;
  *   - SimHash: same banding trick on 12-bit fingerprint chunks;
  *   - Jaccard runs only on LSH candidate pairs (verify stage), so its cost
  *     is proportional to candidates, not N².
  *
  * All hashes are md5-derived (engine-portable) so every stage is verified
  * against a DuckDB oracle computing the identical algorithm.
  */
object Dedup {

  private val with16Mins: Seq[(String, String)] =
    (0 until 16).map(j => (s"m$j", permSql(j, "hv")))

  /** `mh` CTE: doc_id → 16-permutation MinHash signature (DuckDB). */
  private val mhCte: String =
    s"""mh AS (
       |  SELECT doc_id, ${with16Mins.map { case (n, e) => s"min($e) AS $n" }.mkString(", ")}
       |  FROM hd GROUP BY doc_id
       |)""".stripMargin

  private def bandExprSql(b: Int): String =
    s"md5(concat_ws(',', ${(0 until 4).map(r => s"m${4 * b + r}").mkString(", ")}))"

  private val bandsCte: String =
    s"""bands AS (
       |  ${(0 until 4).map(b => s"SELECT doc_id, $b AS band, ${bandExprSql(b)} AS bv FROM mh")
            .mkString("\n  UNION ALL ")}
       |)""".stripMargin

  private val candCte: String =
    """cand AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_bands
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id
      |)""".stripMargin

  private def minhashPrelude: String =
    s"""WITH ${Corpora.dedupCorpusCte},
       |${Corpora.shingleHashesCte},
       |$mhCte,
       |$bandsCte,
       |$candCte""".stripMargin

  /** Spark: doc_id → (band, bv) rows, the LSH bucket keys. */
  private def sparkBands(s: org.apache.spark.sql.SparkSession, d: String) = {
    val mins = (0 until 16).map(j => min(perm(j, col("hv"))).as(s"m$j"))
    val mh = Corpora.shingleHashes(s, d)
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until 4).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws(",", (0 until 4).map(r => col(s"m${4 * b + r}")): _*)).as("bv"))
    }
    // persisted: the candidate generator self-joins bands with itself, and
    // without materialization each side re-derives signatures from scratch
    mh.select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bv").as("bv"))
      .transform(graft.Persisting.maybe)
  }

  private def sparkCand(s: org.apache.spark.sql.SparkSession, d: String) = {
    val bands = sparkBands(s, d)
    val x = bands.as("x")
    val y = bands.as("y")
    x.join(y,
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Exact dedup: hash-groupBy on content (SURVEY.md dedup row). */
  val qDedupExact: QueryDef = QueryDef.sql(
    "q_dedup_exact",
    s"""WITH ${Corpora.dedupCorpusCte}
       |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM corpus
       |GROUP BY text
       |ORDER BY keep_id""".stripMargin) { (s, d) =>
    Corpora.dedupCorpus(s, d)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")
  }

  /** MinHash + LSH banding: candidate near-dup pairs with shared-band count. */
  val qDedupMinhash: QueryDef = QueryDef.sql(
    "q_dedup_minhash",
    s"""$minhashPrelude
       |SELECT a, b, n_bands FROM cand ORDER BY a, b""".stripMargin) { (s, d) =>
    sparkCand(s, d).orderBy("a", "b")
  }

  /** n-gram Jaccard as the verify stage over MinHash candidates. */
  val qDedupNgram: QueryDef = QueryDef.sql(
    "q_dedup_ngram",
    s"""$minhashPrelude,
       |sizes AS (SELECT doc_id, count(*) AS n FROM hd GROUP BY doc_id),
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS ni
       |  FROM cand c
       |  JOIN hd x ON x.doc_id = c.a
       |  JOIN hd y ON y.doc_id = c.b AND y.hv = x.hv
       |  GROUP BY c.a, c.b
       |)
       |SELECT i.a, i.b,
       |       round(CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni), 4) AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.a
       |JOIN sizes sb ON sb.doc_id = i.b
       |WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5
       |ORDER BY i.a, i.b""".stripMargin) { (s, d) =>
    val hd = Corpora.shingleHashes(s, d)
    val sizes = hd.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val cand = sparkCand(s, d).select("a", "b")
    val inter = cand
      .join(hd.as("x"), col("x.doc_id") === col("a"))
      .join(hd.as("y"), col("y.doc_id") === col("b") && col("y.hv") === col("x.hv"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("ni"))
    val jac = col("ni").cast("double") / (col("na") + col("nb") - col("ni"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"),
        col("da") === col("a"))
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"),
        col("db") === col("b"))
      .where(jac >= 0.5)
      .select(col("a"), col("b"), round(jac, 4).as("jaccard"))
      .orderBy("a", "b")
  }

  /** SimHash: 48-bit weighted-bit fingerprint, 4×12-bit band candidates,
    * Hamming-distance filter.
    *
    * The fingerprint is computed as 48 `sum` aggregates in ONE groupBy over
    * word occurrences (map-side combined, single shuffle of 48 counters per
    * doc) — not by exploding 48 bit-rows per word, which would shuffle 48×
    * the corpus token count. */
  val qDedupSimhash: QueryDef = QueryDef.sql(
    "q_dedup_simhash",
    s"""WITH ${Corpora.dedupCorpusCte},
       |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
       |wc AS (
       |  SELECT doc_id, word, count(*) AS cnt
       |  FROM tok, unnest(w) AS u(word)
       |  GROUP BY doc_id, word
       |),
       |wh AS (SELECT doc_id, ${md5LongSql("word")} AS h, cnt FROM wc),
       |bs AS (
       |  SELECT doc_id,
       |         ${(0 until 48).map(i => s"sum(cnt * (2 * ((h >> $i) & 1) - 1)) AS s$i").mkString(",\n         ")}
       |  FROM wh GROUP BY doc_id
       |),
       |fp AS (
       |  SELECT doc_id,
       |         ${(0 until 48).map(i => s"(CASE WHEN s$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)").mkString(" + ")} AS f
       |  FROM bs
       |),
       |sbands AS (
       |  SELECT doc_id, b AS band, (f >> (12 * b)) & 4095 AS bv
       |  FROM fp, (SELECT unnest(range(0, 4)) AS b) g
       |),
       |scand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM sbands x JOIN sbands y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
       |)
       |SELECT c.a, c.b, CAST(bit_count(xor(fa.f, fb.f)) AS INTEGER) AS hamming
       |FROM scand c
       |JOIN fp fa ON fa.doc_id = c.a
       |JOIN fp fb ON fb.doc_id = c.b
       |WHERE bit_count(xor(fa.f, fb.f)) <= 8
       |ORDER BY c.a, c.b""".stripMargin) { (s, d) =>
    // (doc, word) pre-aggregation before hashing/bit-summing: the groupBy
    // is map-side combined, so only distinct tokens per doc reach the 48
    // bit sums (and md5 runs once per distinct word, not per occurrence)
    val words = Corpora.dedupCorpus(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val wc = words.groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
    val wh = wc.select(col("doc_id"), md5Long(col("word")).as("h"), col("cnt"))
    val bitSums = (0 until 48).map(i =>
      sum(col("cnt") * (expr(s"shiftright(h, $i) & 1") * 2 - 1)).as(s"s$i"))
    val bs = wh.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = bs.select(
      col("doc_id"),
      (0 until 48).map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
        .reduce(_ + _).as("f"))
      // two consumers below (pair sides) — materialize the 7.4k fingerprints
      .transform(graft.Persisting.maybe)
    val sbands = fp
      .select(col("doc_id"), col("f"), explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("doc_id"), col("f"), col("band"),
        expr("shiftright(f, 12 * band) & 4095").as("bv"))
    val scand = sbands.as("x")
      .join(sbands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val hamming = expr("bit_count(fa.f ^ fb.f)")
    scand
      .join(fp.as("fa"), col("fa.doc_id") === col("a"))
      .join(fp.as("fb"), col("fb.doc_id") === col("b"))
      .where(hamming <= 8)
      .select(col("a"), col("b"), hamming.cast("int").as("hamming"))
      .orderBy("a", "b")
  }

  val all: Seq[QueryDef] = Seq(qDedupExact, qDedupMinhash, qDedupNgram, qDedupSimhash)
}
