package graft.operators

import graft.{Persisting, QueryDef, Tables}
import graft.api.Curation
import graft.functions.CrossHash._
import org.apache.spark.sql.functions._

/** Corpus-curation suite over `documents` (SURVEY.md §2.B): the operators
  * a training-data pipeline runs between ingest and dedup — repetition
  * profiling (Gopher-style quality signals), overlapping token-window
  * chunking, benchmark decontamination by n-gram overlap, sketch-pruned
  * heavy hitters, and PII redaction. Implementations live in
  * [[graft.api.Curation]]; this file instantiates them as oracle-gated
  * queries.
  *
  * Reference provenance: the reference pipeline has no curation stage —
  * these extend its surface with the LLM-data-pipeline operators the
  * builder prompt declares first-class (dedup/quality adjacency:
  * datastream-processing-main filters only on a guard predicate,
  * FilterFunc.java:10-14; everything here is new capability).
  */
object Curation_ {

  /** Gopher-style repetition signals: top-word fraction + duplicate
    * 2-/3-gram fractions per document, with the keep/flag decision. */
  val qRepetition: QueryDef = QueryDef.sql(
    "q_repetition",
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (
      |  SELECT doc_id, w,
      |         list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bg,
      |         list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tg
      |  FROM tok
      |),
      |st AS (
      |  SELECT doc_id,
      |         CAST(len(w) AS INTEGER) AS n_tokens,
      |         CAST(list_max(list_transform(list_distinct(w), x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w) AS top_word_frac,
      |         CASE WHEN len(bg) > 0 THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) ELSE 0.0 END AS dup_bigram_frac,
      |         CASE WHEN len(tg) > 0 THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg) ELSE 0.0 END AS dup_trigram_frac
      |  FROM g
      |)
      |SELECT doc_id, n_tokens,
      |       round(top_word_frac, 4) AS top_word_frac,
      |       round(dup_bigram_frac, 4) AS dup_bigram_frac,
      |       round(dup_trigram_frac, 4) AS dup_trigram_frac,
      |       (top_word_frac > 0.2 OR dup_bigram_frac > 0.3) AS repetitive
      |FROM st ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.repetitionSignals(Tables.documents(s, d), col("doc_id"), col("text"))
      .select(
        col("id").as("doc_id"), col("n_tokens"),
        round(col("top_word_frac"), 4).as("top_word_frac"),
        round(col("dup_bigram_frac"), 4).as("dup_bigram_frac"),
        round(col("dup_trigram_frac"), 4).as("dup_trigram_frac"),
        (col("top_word_frac") > 0.2 || col("dup_bigram_frac") > 0.3).as("repetitive"))
      .orderBy("doc_id")
  }

  /** Overlapping token-window chunking (size 32, stride 24): the fixed-
    * context windows an embedding/training pipeline feeds a model. */
  val qDocChunks: QueryDef = QueryDef.sql(
    "q_doc_chunks",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (SELECT doc_id, w, unnest(range(0, len(w), 24)) AS start FROM t)
      |SELECT doc_id,
      |       CAST(start // 24 AS INTEGER) AS chunk_id,
      |       CAST(least(len(w) - start, 32) AS INTEGER) AS n_toks,
      |       array_to_string(w[start + 1 : start + 32], ' ') AS chunk
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Curation.chunk(Tables.documents(s, d), col("doc_id"), col("text"),
        size = 32, stride = 24)
      .select(col("id").as("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        col("n_toks").cast("int").as("n_toks"), col("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Benchmark decontamination: every training doc (source ≠ src0) sharing
    * ≥1 word 3-gram with the eval slice (source = src0), with its distinct
    * overlap count. Eval fingerprints broadcast against the corpus. */
  val qDecontaminate: QueryDef = QueryDef.sql(
    "q_decontaminate",
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shingles
       |  FROM tok
       |),
       |hd AS (
       |  SELECT DISTINCT doc_id, ${shingleHashSql("s")} AS hv
       |  FROM sh, unnest(shingles) AS u(s)
       |),
       |ev AS (
       |  SELECT DISTINCT hv FROM hd JOIN documents USING (doc_id) WHERE source = 'src0'
       |)
       |SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM hd h JOIN documents d USING (doc_id)
       |WHERE d.source <> 'src0' AND h.hv IN (SELECT hv FROM ev)
       |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin) { (s, d) =>
    Curation.decontaminate(Tables.documents(s, d), col("doc_id"), col("text"),
        col("source") === "src0", n = 3)
      .select(col("id").as("doc_id"), col("n_shared"))
      .orderBy("doc_id")
  }

  /** Sketch-pruned heavy hitters: corpus words with exact frequency ≥ 1 %
    * of all tokens. freqItems sketch prunes, exact count confirms — the
    * output is exact no matter what the sketch emitted. */
  val qHeavyHitters: QueryDef = QueryDef.sql(
    "q_heavy_hitters",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |n AS (SELECT count(*) AS total FROM tok)
      |SELECT word, count(*) AS cnt, round(CAST(count(*) AS DOUBLE) / max(total), 4) AS frac
      |FROM tok CROSS JOIN n
      |GROUP BY word
      |HAVING count(*) * 100 >= max(total)
      |ORDER BY cnt DESC, word""".stripMargin) { (s, d) =>
    Curation.heavyHitters(Tables.documents(s, d), col("text"), pct = 1)
      .select(col("word"), col("cnt"), round(col("frac"), 4).as("frac"))
      .orderBy(col("cnt").desc, col("word"))
  }

  /** PII redaction over a derived contact note (e-mail + phone + digit-run
    * masking, applied in leak-safe order). The note derives from
    * `customer` by pure column arithmetic, mirrored in the oracle, so the
    * redaction rules fire on realistic shapes. */
  val qPiiScrub: QueryDef = QueryDef.sql(
    "q_pii_scrub",
    """WITH contacts AS (
      |  SELECT c_custkey,
      |         'reach ' || c_name || ' at user' || c_custkey || '@example.com or +1-555-' ||
      |           lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' re account ' ||
      |           CAST(c_custkey * 7919 AS VARCHAR) AS note
      |  FROM customer
      |)
      |SELECT c_custkey,
      |       regexp_replace(
      |         regexp_replace(
      |           regexp_replace(note, '[a-z0-9._]+@[a-z0-9.-]+', '[EMAIL]', 'g'),
      |           '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
      |         '[0-9]{5,}', '[ID]', 'g') AS scrubbed
      |FROM contacts ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val note = concat(
      lit("reach "), col("c_name"), lit(" at user"),
      col("c_custkey").cast("string"), lit("@example.com or +1-555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
      lit(" re account "), (col("c_custkey") * 7919).cast("string"))
    Tables.customer(s, d)
      .select(col("c_custkey"), Curation.scrubPii(note).as("scrubbed"))
      .orderBy("c_custkey")
  }

  /** Sequence packing ([[Curation.pack]]): documents concatenated in id
    * order, cut into 512-token bins, each doc mapped to its bin
    * coordinates (crossing boundaries like packed pretraining batches).
    * The global prefix sum runs in the scalable two-phase shape — bucket
    * partials + a model-sized bucket running total + within-bucket
    * windows — never one single-reducer global window. Integer-exact. */
  val qPack: QueryDef = QueryDef.sql(
    "q_pack",
    """WITH t AS (
      |  SELECT doc_id AS id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |         doc_id // 100 AS bucket
      |  FROM documents
      |),
      |b AS (SELECT bucket, sum(n) AS bn FROM t GROUP BY bucket),
      |bo AS (
      |  SELECT bucket,
      |         CAST(COALESCE(sum(bn) OVER (ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS boff
      |  FROM b
      |),
      |wc AS (
      |  SELECT id, n, bucket,
      |         CAST(sum(n) OVER (PARTITION BY bucket ORDER BY id) AS BIGINT) AS wcum
      |  FROM t
      |),
      |s AS (
      |  SELECT wc.id, wc.n, bo.boff + wc.wcum - wc.n AS sprev
      |  FROM wc JOIN bo ON bo.bucket = wc.bucket
      |)
      |SELECT id AS doc_id, n AS n_tokens,
      |       CAST(sprev // 512 AS BIGINT) AS start_bin,
      |       CAST(sprev % 512 AS BIGINT) AS start_off,
      |       CAST((sprev + n - 1) // 512 AS BIGINT) AS end_bin,
      |       ((sprev + n - 1) // 512) > (sprev // 512) AS spans_bins
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.pack(Tables.documents(s, d), col("doc_id"), col("text"),
        capacity = 512, bucketSize = 100)
      .select(col("id").as("doc_id"), col("n_tokens"), col("start_bin"),
        col("start_off"), col("end_bin"), col("spans_bins"))
      .orderBy("doc_id")
  }

  /** Domain-mixture resampling ([[graft.api.Sampling.mixture]]): even-
    * numbered sources get weight 3, odd weight 1; each source keeps an
    * EXACT quota proportional to its weight at the largest total the
    * corpus supports without upsampling, selected in deterministic
    * md5-hash order. The "data mixing" step between curation and
    * training, with quotas integer-exact and the selection replayable by
    * the oracle. */
  val qMixture: QueryDef = QueryDef.sql(
    "q_mixture",
    s"""WITH r AS (
       |  SELECT doc_id AS id, source AS stratum,
       |         CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0 THEN 3 ELSE 1 END AS w
       |  FROM documents
       |),
       |c AS (SELECT stratum, count(*) AS n_avail, min(w) AS w0 FROM r GROUP BY stratum),
       |k AS (SELECT min(n_avail // w0) AS k FROM c),
       |q AS (SELECT stratum, n_avail, w0 * k.k AS quota FROM c, k),
       |rk AS (
       |  SELECT r.id, r.stratum,
       |         CAST(row_number() OVER (PARTITION BY r.stratum
       |           ORDER BY ${graft.functions.CrossHash.md5LongSql("CAST(r.id AS VARCHAR)")}, r.id) AS BIGINT) AS rnk
       |  FROM r
       |)
       |SELECT rk.id, rk.stratum, c.n_avail, CAST(q.quota AS BIGINT) AS quota, rk.rnk
       |FROM rk JOIN q ON q.stratum = rk.stratum JOIN c ON c.stratum = rk.stratum
       |WHERE rk.rnk <= q.quota
       |ORDER BY rk.stratum, rk.rnk""".stripMargin) { (s, d) =>
    graft.api.Sampling.mixture(
        Tables.documents(s, d), col("doc_id"), col("source"),
        when(substring(col("source"), 4, 10).cast("int") % 2 === 0, 3).otherwise(1))
      .orderBy("stratum", "rnk")
  }

  /** Paragraph/chunk-level exact dedup: the sub-document granularity a
    * corpus pipeline dedups at (repeated boilerplate paragraphs survive
    * document-level dedup). Full 32-token chunks digest to md5 and
    * group — only the 16-byte digest shuffles, text stays in the map
    * stage; `keeper` picks the canonical (doc, chunk) deterministically.
    * Composes [[Curation.chunk]] with the `q_dedup_exact` digest-groupBy
    * shape. */
  val qChunkDedup: QueryDef = QueryDef.sql(
    "q_chunk_dedup",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (SELECT doc_id, w, unnest(range(0, len(w), 24)) AS start FROM t),
      |ch AS (
      |  SELECT doc_id, CAST(start // 24 AS INTEGER) AS chunk_id,
      |         array_to_string(w[start + 1 : start + 32], ' ') AS chunk,
      |         least(len(w) - start, 32) AS n_toks
      |  FROM c
      |)
      |SELECT md5(chunk) AS dig,
      |       CAST(count(*) AS BIGINT) AS n_copies,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(min(doc_id * 100000 + chunk_id) AS BIGINT) AS keeper
      |FROM ch WHERE n_toks = 32
      |GROUP BY dig HAVING count(*) > 1
      |ORDER BY dig""".stripMargin) { (s, d) =>
    Curation.chunk(Tables.documents(s, d), col("doc_id"), col("text"),
        size = 32, stride = 24)
      .filter(col("n_toks") === 32)
      .select(md5(col("chunk")).as("dig"), col("id"), col("chunk_id"))
      .groupBy("dig")
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("id")).as("n_docs"),
        min(col("id") * 100000L + col("chunk_id")).cast("long").as("keeper"))
      .filter(col("n_copies") > 1)
      .orderBy("dig")
  }

  /** Suffix-granularity exact substring dedup (the Lee et al. duplicated-
    * span problem): [[qChunkDedup]]'s fixed 32-token grid misses a span
    * duplicated at DIFFERENT offsets in two documents — the copies chunk
    * against different grids. Content-defined chunking
    * ([[graft.api.Curation.cdcChunk]]) derives boundaries from token
    * hashes, so every copy of a span yields the same interior chunks no
    * matter where it starts; duplicated spans ≥ a couple of boundary
    * intervals surface as shared chunk digests. Same scale shape as
    * [[qChunkDedup]]: chunking is map-only, only 16-byte digests (plus
    * ids) shuffle, map-side combined. */
  val qSpanDedup: QueryDef = QueryDef.sql(
    "q_span_dedup",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |b AS (SELECT doc_id, w,
       |        list_concat(list_concat([0],
       |          list_filter(range(0, len(w)),
       |            i -> i >= 1 AND (${graft.functions.CrossHash.md5LongSql("w[i+1]")} % 16) = 0)),
       |          [len(w)]) AS b
       |      FROM t),
       |c AS (SELECT doc_id, b, w, unnest(range(0, len(b) - 1)) AS j FROM b),
       |ch AS (SELECT doc_id, CAST(j AS INTEGER) AS chunk_id,
       |              b[j+2] - b[j+1] AS n_toks,
       |              array_to_string(w[b[j+1]+1 : b[j+2]], ' ') AS chunk
       |       FROM c)
       |SELECT md5(chunk) AS dig,
       |       CAST(count(*) AS BIGINT) AS n_copies,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(min(doc_id * 100000 + chunk_id) AS BIGINT) AS keeper
       |FROM ch WHERE n_toks >= 8
       |GROUP BY dig HAVING count(*) > 1
       |ORDER BY dig""".stripMargin) { (s, d) =>
    graft.api.Curation.cdcChunk(
        Tables.documents(s, d), col("doc_id"), col("text"), p = 16)
      .filter(col("n_toks") >= 8)
      .select(md5(col("chunk")).as("dig"), col("id"), col("chunk_id"))
      .groupBy("dig")
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("id")).as("n_docs"),
        min(col("id") * 100000L + col("chunk_id")).cast("long").as("keeper"))
      .filter(col("n_copies") > 1)
      .orderBy("dig")
  }

  /** Per-domain frequency capping — the crawl-pipeline staple that stops
    * a handful of giant hosts from dominating a training mix: keep at most
    * K=5 documents per (source, lang) domain, preferring the longest
    * (`n_chars` DESC, `doc_id` ASC on ties).
    *
    * Scale shape (the whole point of this operator at 100 TB):
    *   - domain sizes come from one map-side-combined count, broadcast
    *     back onto the corpus (domains ≪ documents);
    *   - the LONG TAIL (domains already under the cap — the vast majority
    *     of hosts in a real crawl) passes through with NO per-domain sort
    *     or shuffle beyond the broadcast probe;
    *   - only over-cap domains reach the top-K stage, and that stage is
    *     the bounded heap aggregate ([[graft.functions.TopKAgg]]), so even
    *     a single billion-document domain contributes ≤ K rows per map
    *     partition to the exchange — never the single-reducer
    *     `row_number()` sort the naive window formulation pays.
    *
    * The oracle replays the same keep-set with the window formulation
    * (values identical by `TopKAgg`'s tie contract). */
  val qDomainCap: QueryDef = QueryDef.sql(
    "q_domain_cap",
    """WITH g AS (
      |  SELECT source, lang, count(*) AS cnt FROM documents GROUP BY source, lang
      |),
      |r AS (
      |  SELECT d.doc_id, d.source, d.lang,
      |         row_number() OVER (PARTITION BY d.source, d.lang
      |                            ORDER BY d.n_chars DESC, d.doc_id) AS rk
      |  FROM documents d JOIN g ON d.source = g.source AND d.lang = g.lang
      |  WHERE g.cnt > 5
      |)
      |SELECT doc_id, source, lang FROM (
      |  SELECT d.doc_id, d.source, d.lang FROM documents d
      |  JOIN g ON d.source = g.source AND d.lang = g.lang
      |  WHERE g.cnt <= 5
      |  UNION ALL
      |  SELECT doc_id, source, lang FROM r WHERE rk <= 5
      |)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    val g = docs.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
    val withCnt = docs.join(broadcast(g), Seq("source", "lang"))
    val pass = withCnt.where(col("cnt") <= 5)
      .select(col("doc_id"), col("source"), col("lang"))
    val capped = withCnt.where(col("cnt") > 5)
      .groupBy("source", "lang")
      .agg(graft.functions.TopKAgg.top_k_agg(
        col("n_chars").cast("double"), col("doc_id"), 5).as("tk"))
      .select(col("source"), col("lang"), explode(col("tk")).as("x"))
      .select(col("x.id").as("doc_id"), col("source"), col("lang"))
    pass.union(capped).orderBy("doc_id")
  }

  /** End-to-end curation PIPELINE — the composed shape a real training-data
    * run ships, as one query: quality gate → exact dedup → domain cap,
    * with every document attributed to the FIRST stage that dropped it
    * (`quality` | `dup` | `domain_cap` | `kept`). Demonstrates that the
    * suite's stages compose: each stage consumes exactly the previous
    * stage's survivors, so attrition is well-defined and replayable.
    *
    * Corpus = documents ∪ exact copies of every doc_id % 7 == 0 (the
    * [[Corpora.dedupCorpus]] planting pattern) so the dedup stage has
    * real work. Stage shapes are the individually-pinned ones: the
    * quality predicate is per-row arithmetic ([[graft.api.TextProfile]]),
    * dedup groups 16-byte digests (text leaves the row before the
    * exchange), the cap reuses the `q_domain_cap` long-tail passthrough +
    * bounded-heap split (K=3 over post-dedup survivors). Assembly joins
    * are id-only frames. */
  val qCuratePipeline: QueryDef = QueryDef.sql(
    "q_curate_pipeline",
    s"""WITH corpus AS (
       |  SELECT doc_id, text, lang, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, text, lang, source FROM documents WHERE doc_id % 7 = 0
       |),
       |st AS (
       |  SELECT doc_id,
       |         (CAST(len(w) AS INTEGER) >= 20
       |          AND CAST(len(list_filter(w, x -> list_contains(${TextAnalysis.stopListSql}, x))) AS DOUBLE) / len(w) >= 0.02
       |          AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.4
       |          AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) <= 0.9) AS q_keep
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
       |),
       |dk AS (
       |  SELECT c.doc_id, c.source, c.lang, CAST(length(c.text) AS BIGINT) AS n_chars,
       |         (c.doc_id = min(c.doc_id) OVER (PARTITION BY c.text)) AS d_keep
       |  FROM corpus c JOIN st ON c.doc_id = st.doc_id
       |  WHERE st.q_keep
       |),
       |surv AS (SELECT doc_id, source, lang, n_chars FROM dk WHERE d_keep),
       |g AS (SELECT source, lang, count(*) AS cnt FROM surv GROUP BY source, lang),
       |r AS (
       |  SELECT s.doc_id,
       |         row_number() OVER (PARTITION BY s.source, s.lang
       |                            ORDER BY s.n_chars DESC, s.doc_id) AS rk
       |  FROM surv s JOIN g ON s.source = g.source AND s.lang = g.lang
       |  WHERE g.cnt > 3
       |),
       |capkeep AS (
       |  SELECT s.doc_id FROM surv s JOIN g ON s.source = g.source AND s.lang = g.lang
       |  WHERE g.cnt <= 3
       |  UNION ALL
       |  SELECT doc_id FROM r WHERE rk <= 3
       |)
       |SELECT c.doc_id,
       |       CASE WHEN NOT st.q_keep THEN 'quality'
       |            WHEN NOT dk.d_keep THEN 'dup'
       |            WHEN k.doc_id IS NULL THEN 'domain_cap'
       |            ELSE 'kept' END AS stage
       |FROM corpus c
       |JOIN st ON c.doc_id = st.doc_id
       |LEFT JOIN dk ON c.doc_id = dk.doc_id
       |LEFT JOIN capkeep k ON c.doc_id = k.doc_id
       |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val copies = base.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        col("text"), col("lang"), col("source"))
    val corpus = base.unionAll(copies)
    val st = graft.api.TextProfile
      .stats(corpus, col("doc_id"), col("text"), TextAnalysis.Stopwords)
      .select(col("id").as("doc_id"),
        (col("n_tokens") >= 20 && col("stop_ratio") >= 0.02 &&
          col("ttr") >= 0.4 && col("ttr") <= 0.9).as("q_keep"))
    val qual = Persisting.maybe(corpus.join(st, "doc_id"))
    val qk = qual.where(col("q_keep"))
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("long").as("n_chars"), md5(col("text")).as("dig"))
    val keeper = qk.groupBy("dig").agg(min(col("doc_id")).as("keep_id"))
    val dtag = Persisting.maybe(qk.join(keeper, "dig")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        (col("doc_id") === col("keep_id")).as("d_keep")))
    val surv = dtag.where(col("d_keep"))
      .select("doc_id", "source", "lang", "n_chars")
    val g = surv.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
    val withCnt = surv.join(broadcast(g), Seq("source", "lang"))
    val capKeep = withCnt.where(col("cnt") <= 3).select("doc_id")
      .unionAll(
        withCnt.where(col("cnt") > 3)
          .groupBy("source", "lang")
          .agg(graft.functions.TopKAgg.top_k_agg(
            col("n_chars").cast("double"), col("doc_id"), 3).as("tk"))
          .select(explode(col("tk")).as("x"))
          .select(col("x.id").as("doc_id")))
      .withColumn("c_keep", lit(true))
    qual.select(col("doc_id"), col("q_keep"))
      .join(dtag.select(col("doc_id"), col("d_keep")), Seq("doc_id"), "left")
      .join(capKeep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(!col("q_keep"), "quality")
          .when(!col("d_keep"), "dup")
          .when(col("c_keep").isNull, "domain_cap")
          .otherwise("kept").as("stage"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split (90/5/5) — the assignment every
    * training run needs to be REPRODUCIBLE and engine-independent: bucket =
    * 56-bit md5 of the doc id mod 100 ([[graft.functions.CrossHash]], the
    * cross-engine hash the mixture/minhash ops already share), so the same
    * document lands in the same split on any cluster, any partitioning,
    * any engine that can compute md5. Output is the per-(split, lang)
    * document and character census a mixture planner consumes.
    *
    * Scale shape: the bucket is per-row scan-stage arithmetic (codegen'd
    * digest expression, no shuffle), and the census is one map-side-combined
    * groupBy on ≤ 3×|langs| keys — bytes on the wire are partials, never
    * documents. At 100 TB the split column costs a projection. */
  val qTrainSplit: QueryDef = QueryDef.sql(
    "q_train_split",
    s"""WITH h AS (
       |  SELECT lang, n_chars,
       |         ${graft.functions.CrossHash.md5LongSql("CAST(doc_id AS VARCHAR)")} % 100 AS b
       |  FROM documents
       |)
       |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
       |       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM h GROUP BY split, lang
       |ORDER BY split, lang""".stripMargin) { (s, d) =>
    val b = graft.functions.CrossHash.md5Long(col("doc_id").cast("string")) % 100
    Tables.documents(s, d)
      .select(
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"),
        col("lang"), col("n_chars"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("split", "lang")
  }

  val all: Seq[QueryDef] =
    Seq(qRepetition, qDocChunks, qDecontaminate, qHeavyHitters, qPiiScrub, qPack,
      qMixture, qChunkDedup, qSpanDedup, qDomainCap, qCuratePipeline, qTrainSplit)
}
