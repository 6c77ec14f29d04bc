package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.CrossHash._
import org.apache.spark.sql.functions._

/** Text-analysis suite over `documents` (SURVEY.md §2.B north-star row):
  * token counting (whitespace + BPE-ish subword estimate), quality scoring
  * (stopword ratio, type-token ratio), language-ID heuristic, term
  * frequency, and rolling-hash document fingerprinting.
  *
  * Everything is per-row array arithmetic (narrow, codegen'd) except the
  * explode+groupBy in term frequency — the one shuffle, map-side combined.
  * At 100 TB these scale linearly with input: no shuffle carries the
  * document text, only 8-byte hashes/counters.
  */
object TextAnalysis {

  private[operators] val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")
  private[operators] val stopListSql = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Per-doc stats + quality score + stopword-based language guess. */
  val qTextStats: QueryDef = QueryDef.sql(
    "q_text_stats",
    s"""WITH tok AS (
       |  SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
       |),
       |st AS (
       |  SELECT doc_id, lang,
       |         CAST(len(w) AS INTEGER) AS n_tokens,
       |         CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
       |         CAST(length(text) AS DOUBLE) / len(w) AS tok_len,
       |         CAST(len(list_filter(w, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(w) AS stop_r,
       |         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(w, x -> CAST((length(x) + 3) // 4 AS BIGINT))),
       |           (acc, x) -> acc + x) AS n_bpe_tokens
       |  FROM tok
       |)
       |SELECT doc_id, lang, n_tokens, n_distinct, n_bpe_tokens,
       |       round(tok_len, 4) AS avg_tok_len,
       |       round(stop_r, 4) AS stop_ratio,
       |       round(ttr, 4) AS ttr,
       |       round((2 * stop_r + ttr) / 3, 4) AS quality,
       |       CASE WHEN stop_r >= 0.02 THEN 'en' ELSE 'other' END AS lang_guess
       |FROM st
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    graft.api.TextProfile.stats(docs, col("doc_id"), col("text"), Stopwords)
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
      .select(
        col("id").as("doc_id"), col("lang"), col("n_tokens"), col("n_distinct"),
        col("n_bpe_tokens"),
        round(col("avg_tok_len"), 4).as("avg_tok_len"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("ttr"), 4).as("ttr"),
        round(col("quality"), 4).as("quality"),
        col("lang_guess"))
      .orderBy("doc_id")
  }

  /** Language-ID evaluation: confusion counts of heuristic guess vs label. */
  val qLangId: QueryDef = QueryDef.sql(
    "q_lang_id",
    s"""WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
       |SELECT lang,
       |       CASE WHEN CAST(len(list_filter(w, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(w) >= 0.02
       |            THEN 'en' ELSE 'other' END AS lang_guess,
       |       count(*) AS cnt,
       |       round(avg(CAST(len(w) AS DOUBLE)), 4) AS avg_tokens
       |FROM tok
       |GROUP BY 1, 2
       |ORDER BY lang, lang_guess""".stripMargin) { (s, d) =>
    val stopArr = array(Stopwords.map(lit): _*)
    Tables.documents(s, d)
      .select(col("lang"), split(col("text"), " ").as("w"))
      .select(
        col("lang"),
        when(size(filter(col("w"), x => array_contains(stopArr, x))).cast("double") /
          size(col("w")) >= 0.02, "en").otherwise("other").as("lang_guess"),
        size(col("w")).cast("double").as("nt"))
      .groupBy("lang", "lang_guess")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("nt").cast("decimal(18,6)")).cast("double") / count(lit(1)), 4)
          .as("avg_tokens"))
      .orderBy("lang", "lang_guess")
  }

  /** Corpus term frequency: explode → groupBy → top 50. */
  val qTextTf: QueryDef = QueryDef.sql(
    "q_text_tf",
    """SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY tf DESC, word
      |LIMIT 50""".stripMargin) { (s, d) =>
    graft.api.TextProfile
      .termFrequency(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy(col("tf").desc, col("word"))
      .limit(50)
  }

  /** Rolling polynomial hash over word hashes — order-sensitive document
    * fingerprint (same docs ⇒ same fp; any reorder/edit ⇒ different). */
  val qTextFingerprint: QueryDef = QueryDef.sql(
    "q_text_fingerprint",
    s"""SELECT doc_id,
       |       list_reduce(
       |         list_prepend(CAST(0 AS BIGINT),
       |           list_transform(string_split(text, ' '), x -> ${shingleHashSql("x")})),
       |         (acc, h) -> (acc * 131 + h) % $P) AS fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.api.TextProfile
      .fingerprint(Tables.documents(s, d), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** tf-idf term weighting: top 100 (doc, term) pairs corpus-wide. The
    * idf uses real `ln` — Java's and DuckDB's `log` agree bit-for-bit on
    * these rationals (both correctly-rounded IEEE doubles), pinned by the
    * oracle hash-match. Ordering is on the ROUNDED score with (doc_id,
    * word) tie-breaks, so the comparison can't hinge on sub-round ulps. */
  val qTextTfidf: QueryDef = QueryDef.sql(
    "q_text_tfidf",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, word, tf, df,
      |       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
      |FROM tf JOIN dfreq USING (word) CROSS JOIN n
      |ORDER BY tfidf DESC, doc_id, word
      |LIMIT 100""".stripMargin) { (s, d) =>
    graft.api.TextProfile
      .tfidf(Tables.documents(s, d), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("word"))
      .limit(100)
  }

  /** Training-corpus quality gate: per-doc keep/drop decision with the
    * first failing rule as the reason — the curation filter a data
    * pipeline runs before dedup. Pure per-row arithmetic; the predicate
    * thresholds compare UNROUNDED ratios (identical doubles in both
    * engines), rounding only at the output boundary. */
  val qQualityFilter: QueryDef = QueryDef.sql(
    "q_quality_filter",
    s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
       |st AS (
       |  SELECT doc_id,
       |         CAST(len(w) AS INTEGER) AS n_tokens,
       |         CAST(len(list_filter(w, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(w) AS stop_r,
       |         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr
       |  FROM tok
       |)
       |SELECT doc_id, n_tokens,
       |       round(stop_r, 4) AS stop_ratio,
       |       round(ttr, 4) AS ttr,
       |       (n_tokens >= 20 AND stop_r >= 0.02 AND ttr >= 0.4 AND ttr <= 0.9) AS keep,
       |       CASE WHEN n_tokens < 20 THEN 'too_short'
       |            WHEN stop_r < 0.02 THEN 'low_stopword'
       |            WHEN ttr < 0.4 THEN 'repetitive'
       |            WHEN ttr > 0.9 THEN 'near_unique'
       |            ELSE 'ok' END AS reason
       |FROM st
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.api.TextProfile
      .stats(Tables.documents(s, d), col("doc_id"), col("text"), Stopwords)
      .select(
        col("id").as("doc_id"), col("n_tokens"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("ttr"), 4).as("ttr"),
        (col("n_tokens") >= 20 && col("stop_ratio") >= 0.02 &&
          col("ttr") >= 0.4 && col("ttr") <= 0.9).as("keep"),
        when(col("n_tokens") < 20, "too_short")
          .when(col("stop_ratio") < 0.02, "low_stopword")
          .when(col("ttr") < 0.4, "repetitive")
          .when(col("ttr") > 0.9, "near_unique")
          .otherwise("ok").as("reason"))
      .orderBy("doc_id")
  }

  /** Real subword token counts (greedy longest-prefix segmentation over
    * the checked-in [[graft.functions.SubwordCount.Vocab]]) next to the
    * `(len+3)/4` closed-form estimate, per document — the error envelope
    * of the estimate is the `n_subword_tokens` vs `n_est_tokens` gap.
    *
    * Spark side is one narrow projection: the codegen'd `subword_count`
    * runs per word inside `transform`/`aggregate` — no explode, no
    * shuffle, text never leaves its scan partition. The oracle replays
    * the greedy rule exactly with a recursive CTE over the same
    * vocabulary (segmentation is deterministic, so both engines agree on
    * every word; DISTINCT words recurse once each, then join back). */
  val qTextTokens: QueryDef = QueryDef.sql(
    "q_text_tokens",
    s"""WITH RECURSIVE vocab(s, l) AS (
       |  SELECT * FROM (VALUES ${graft.functions.SubwordCount.vocabValuesSql}) v(s, l)
       |),
       |words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
       |),
       |dw AS (SELECT DISTINCT word FROM words),
       |rec(word, pos, cnt) AS (
       |  SELECT word, 1, 0 FROM dw
       |  UNION ALL
       |  SELECT r.word,
       |         r.pos + COALESCE((SELECT max(v.l) FROM vocab v
       |                           WHERE substr(r.word, r.pos, v.l) = v.s), 1),
       |         r.cnt + 1
       |  FROM rec r WHERE r.pos <= length(r.word)
       |),
       |wt AS (SELECT word, cnt FROM rec WHERE pos = length(word) + 1)
       |SELECT w.doc_id,
       |       CAST(count(*) AS INTEGER) AS n_tokens,
       |       CAST(sum(wt.cnt) AS BIGINT) AS n_subword_tokens,
       |       CAST(sum((length(w.word) + 3) // 4) AS BIGINT) AS n_est_tokens
       |FROM words w JOIN wt ON wt.word = w.word
       |GROUP BY w.doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = col("w")
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        size(w).as("n_tokens"),
        aggregate(
          transform(w, x => graft.functions.SubwordCount.subword_count(x).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_subword_tokens"),
        aggregate(
          transform(w, x => ((length(x) + 3) / 4).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_est_tokens"))
      .orderBy("doc_id")
  }

  /** BPE merge training over the corpus ([[graft.api.Bpe]]): 8 learned
    * merge rules as (step, a, b, freq). Oracle-gated since round 8: the
    * iterative argmax unrolls into 8 chained CTE rounds in DuckDB (the
    * `q_pagerank` fixed-depth pattern) — each round is one adjacent-pair
    * count + argmax + a merge replace. Training is restricted to
    * `^[a-z]+$` words on BOTH sides so learned symbols are regex-literal-
    * safe in the oracle's dynamically-built replace pattern; the oracle's
    * two consume-trailing replace passes reproduce the trainer's anchored
    * lookahead pass exactly because self-pairs are excluded (see
    * [[graft.api.Bpe.train]]). Also pinned against a sequential reference
    * in `ApiSpec`. */
  private def bpeRoundCte(i: Int): String = {
    val (prev, cur) = (s"w${i - 1}", s"w$i")
    s"""p$i AS (
       |  SELECT t.cnt, t.syms[u.i] AS a, t.syms[u.i+1] AS b
       |  FROM (SELECT cnt, list_filter(string_split(s, '~'), x -> length(x) > 0) AS syms FROM $prev) t,
       |       UNNEST(generate_series(1, length(t.syms) - 1)) AS u(i)
       |  WHERE length(t.syms) >= 2
       |),
       |m$i AS (
       |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS freq FROM p$i
       |  WHERE a <> b GROUP BY a, b
       |  ORDER BY sum(cnt) DESC, a, b LIMIT 1
       |),
       |$cur AS (
       |  SELECT $prev.cnt,
       |         regexp_replace(
       |           regexp_replace($prev.s, '~' || m$i.a || '~' || m$i.b || '~',
       |                          '~' || m$i.a || m$i.b || '~', 'g'),
       |           '~' || m$i.a || '~' || m$i.b || '~',
       |           '~' || m$i.a || m$i.b || '~', 'g') AS s
       |  FROM $prev, m$i
       |)""".stripMargin
  }

  val qBpeTrain: QueryDef = QueryDef.sql(
    "q_bpe_train", {
      val n = 8
      val ctes = (1 to n).map(bpeRoundCte).mkString(",\n")
      val finals = (1 to n)
        .map(i => s"SELECT CAST($i AS BIGINT) AS step, a, b, freq FROM m$i")
        .mkString(" UNION ALL ")
      s"""WITH words AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$$')
         |  GROUP BY w
         |),
         |w0 AS (
         |  SELECT cnt, '~' || array_to_string(string_split(w, ''), '~') || '~' AS s FROM words
         |),
         |$ctes
         |SELECT step, a, b, freq FROM ($finals) ORDER BY step""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    val corpus = Tables.documents(s, d).select(
      array_join(
        filter(split(col("text"), " "), w => w.rlike("^[a-z]+$")), " ").as("text"))
    graft.api.Bpe.train(corpus, col("text"), nMerges = 8)
      .zipWithIndex
      .map { case ((a, b, f), i) => ((i + 1).toLong, a, b, f) }
      .toDF("step", "a", "b", "freq")
  }

  /** BPE tokenizer APPLICATION — the other half of the `q_bpe_train`
    * story: train the 8 merge rules, then ENCODE every document with them
    * and report per-document word and subword-token counts. This is the
    * shape a training-data pipeline actually ships: tokenize the corpus
    * with the learned vocabulary to size shards and pack sequences.
    *
    * Distributed shape ([[graft.api.Bpe.encodeColumn]]): the merge chain
    * runs once over the DISTINCT-word table (vocabulary-sized — 8 anchored
    * `regexp_replace`es in one narrow projection), then the corpus tokens
    * broadcast-join against the encoded vocabulary and one map-side-
    * combined groupBy sums tokens per document. At 100 TB the corpus is
    * scanned once for tokens; the regex chain never touches it. (On a
    * vocabulary too large to broadcast the join falls back to shuffle —
    * both sides key on the word.)
    *
    * Oracle: replays the same 8 training rounds (the `q_bpe_train` CTE
    * chain — `w8` IS the encoded vocabulary; concatenating a row's symbols
    * recovers its word), then the same join+sum. Single-letter words never
    * merge, so they count 1 token via the LEFT JOIN's CASE (the training
    * table excludes them for efficiency). */
  val qBpeEncode: QueryDef = QueryDef.sql(
    "q_bpe_encode", {
      val ctes = (1 to 8).map(bpeRoundCte).mkString(",\n")
      s"""WITH words AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$$')
         |  GROUP BY w
         |),
         |w0 AS (
         |  SELECT cnt, '~' || array_to_string(string_split(w, ''), '~') || '~' AS s FROM words
         |),
         |$ctes,
         |enc AS (
         |  SELECT replace(s, '~', '') AS w,
         |         CAST(length(list_filter(string_split(s, '~'), x -> length(x) > 0)) AS BIGINT) AS n_sub
         |  FROM w8
         |),
         |tok AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE regexp_matches(w, '^[a-z]+$$')
         |)
         |SELECT tok.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(CASE WHEN length(tok.w) = 1 THEN 1 ELSE enc.n_sub END) AS BIGINT) AS n_tokens
         |FROM tok LEFT JOIN enc ON tok.w = enc.w
         |GROUP BY tok.doc_id
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val corpus = docs.select(
      array_join(
        filter(split(col("text"), " "), w => w.rlike("^[a-z]+$")), " ").as("text"))
    val merges = graft.api.Bpe.train(corpus, col("text"), nMerges = 8)
      .map { case (a, b, _) => (a, b) }
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
    val vocab = tok.select("w").distinct()
      .select(col("w"),
        concat(lit("|"), array_join(split(col("w"), ""), "|"), lit("|")).as("s"))
    val enc = vocab.select(col("w"),
      size(filter(split(graft.api.Bpe.encodeColumn(col("s"), merges), "\\|"),
        x => length(x) > 0)).cast("long").as("n_sub"))
    tok.join(broadcast(enc), "w")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_words"),
        sum(col("n_sub")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Unigram language-model scoring: per-document average negative log
    * likelihood under the corpus's own unigram distribution — the standard
    * first-pass "perplexity" quality signal for training-data curation
    * (rare-token-dense documents score high; boilerplate scores low).
    *
    * Float determinism across engines: the per-token value `ln(cnt)` is
    * quantized ONCE to integer micro-nats (`round(ln(cnt)·10⁶)`), so the
    * per-document aggregation is an exact BIGINT sum — no accumulation-
    * order sensitivity in either engine. The only remaining float ops
    * (`ln(T)` and one division per doc) are single deterministic
    * expressions over identical inputs. At 100 TB the shape is one
    * explode+map-side-combined count (the tf shuffle this suite already
    * pays) plus a broadcast-sized vocabulary join back onto tokens.
    */
  val qLmScore: QueryDef = QueryDef.sql(
    "q_lm_score",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |),
      |cnt AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
      |tot AS (SELECT count(*) AS t FROM tok),
      |per_doc AS (
      |  SELECT tok.doc_id,
      |         count(*) AS n_tokens,
      |         sum(CAST(round(ln(cnt.c) * 1000000) AS BIGINT)) AS s_micro
      |  FROM tok JOIN cnt USING (word)
      |  GROUP BY tok.doc_id
      |)
      |SELECT doc_id, n_tokens,
      |       round(ln(t) - (s_micro / 1000000.0) / n_tokens, 4) AS nll
      |FROM per_doc CROSS JOIN tot
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val cnt = tok.groupBy("word").agg(count(lit(1)).as("c"))
    val tot = tok.agg(count(lit(1)).as("t"))
    val perDoc = tok.join(cnt, "word")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(round(log(col("c")) * 1000000).cast("long")).as("s_micro"))
    perDoc.crossJoin(tot)
      .select(col("doc_id"), col("n_tokens"),
        round(log(col("t")) - (col("s_micro") / 1000000.0) / col("n_tokens"), 4).as("nll"))
      .orderBy("doc_id")
  }

  /** BM25 keyword retrieval (Robertson–Spärck Jones / Okapi, the Lucene
    * `+1` idf variant) for a fixed 3-term query, exact-integer formulation:
    *
    *   score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with k1 = 1.2, b = 0.75. idf(t) = ln((N − df + ½)/(df + ½) + 1) is
    * quantized ONCE to integer milli-nats (the q_lm_score precedent); with
    * avgdl = T/N the per-term contribution multiplies out to the integer
    * rational (idf_milli·22000·T·tf) ÷ (10·T·tf + 3·T + 9·dl·N) — micro-nat
    * units, exact `div` on BIGINTs, engine-identical (all operands
    * non-negative, so floor ≡ truncation). Bound: idf·22000·T·tf < 2⁶³
    * holds through ~10⁹ corpus tokens; a 100 TB corpus carries T in
    * kilo-token units (same formula, coarser avgdl quantization).
    *
    * Scale shape: per-doc tf/dl are array HOFs over ONE pruned scan — no
    * explode, no token shuffle; corpus stats (N, T, df_t) are ONE 1-row
    * aggregate cross-attached (the allowed 1-row BNLJ scalar attach); the
    * top-20 compiles to TakeOrderedAndProject. Nothing wide ever shuffles —
    * the inverted-index-free BM25 shape for scoring a fixed query at scale.
    *
    * The scoring stage is factored out ([[bm25Scored]] / [[bm25Ctes]]) so
    * the hybrid-retrieval fusion reuses it unchanged. */
  private val Bm25Terms = Seq("dup", "vector", "join")

  /** DuckDB CTE chain ending in `kws(doc_id, dl, score_micro)` — the exact
    * BM25 formulation of [[bm25Scored]], shared with the hybrid-retrieval
    * fusion ([[Similarity.qHybridSearch]]). */
  private[operators] val bm25Ctes: String = {
    val terms = Bm25Terms
    val tfSql = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n         ")
    val dfSql = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n         ")
    val idfSql = terms.indices.map(i =>
      s"CAST(round(ln((n_docs - df$i + 0.5) / (df$i + 0.5) + 1) * 1000) AS BIGINT) AS idf$i")
      .mkString(",\n         ")
    val scoreSql = terms.indices.map(i =>
      s"(idf$i * 22000 * t_toks * tf$i) // (10 * t_toks * tf$i + 3 * t_toks + 9 * b.dl * n_docs)")
      .mkString(" +\n          ")
    s"""bm_base AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |         $tfSql
       |  FROM documents),
       |bm_stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS t_toks,
       |         $dfSql
       |  FROM bm_base),
       |bm_idf AS (
       |  SELECT n_docs, t_toks,
       |         $idfSql
       |  FROM bm_stats),
       |kws AS (
       |  SELECT b.doc_id, b.dl,
       |         ($scoreSql) AS score_micro
       |  FROM bm_base b CROSS JOIN bm_idf)""".stripMargin
  }

  /** BM25 scores for every document: (doc_id, dl, score_micro). See
    * [[qBm25Search]] for the formulation and scale shape. */
  private[operators] def bm25Scored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val terms = Bm25Terms
    val base = Tables.documents(s, d).select(
      col("doc_id") +:
        size(split(col("text"), " ")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(split(col("text"), " "), x => x === lit(t)))
            .cast("long").as(s"tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_toks") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
    val idfRow = stats.select(
      col("n_docs") +: col("t_toks") +:
        terms.indices.map(i =>
          round(log((col("n_docs") - col(s"df$i") + lit(0.5)) /
            (col(s"df$i") + lit(0.5)) + lit(1)) * 1000)
            .cast("long").as(s"idf$i")): _*)
    val score = terms.indices.map(i =>
      s"(idf$i * 22000 * t_toks * tf$i) div (10 * t_toks * tf$i + 3 * t_toks + 9 * dl * n_docs)")
      .mkString(" + ")
    base.crossJoin(idfRow)
      .selectExpr("doc_id", "dl", s"($score) AS score_micro")
  }

  val qBm25Search: QueryDef = QueryDef.sql(
    "q_bm25_search",
    s"""WITH $bm25Ctes
       |SELECT doc_id, dl, score_micro
       |FROM kws
       |ORDER BY score_micro DESC, doc_id
       |LIMIT 20""".stripMargin) { (s, d) =>
    bm25Scored(s, d)
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(20)
  }

  /** Inverted-index build: term → document frequency + sorted posting
    * list (first 100 doc ids) — the materialized index the BM25 scorer
    * would consult at serving time, built in ONE keyed shuffle: per-doc
    * term presence derives map-side (`array_distinct` over the token
    * array — no (word, doc) distinct shuffle), so the single exchange
    * carries already-deduplicated (word, doc_id) pairs, map-side combined
    * into per-term counts and capped sorted postings. At 100 TB the
    * shuffle is ∝ Σ distinct-terms-per-doc (not token count), keyed by
    * term — the standard distributed index-build shape; the bounded-heap
    * [[graft.functions.TopKAgg]] keeps ≤100 entries per term per map
    * partition, so a stop-word's posting list never materializes anywhere
    * (a collect_list-then-slice would buffer the full list in its
    * reducer). The posting list is emitted comma-joined (a scalar string):
    * the oracle comparator hashes column values and cannot order
    * array-typed cells. */
  val qInvertedIndex: QueryDef = QueryDef.sql(
    "q_inverted_index",
    """WITH tw AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
      |  FROM documents)
      |SELECT word,
      |       CAST(count(*) AS BIGINT) AS df,
      |       array_to_string((list_sort(list(doc_id)))[1:100], ',') AS postings
      |FROM tw
      |GROUP BY word
      |ORDER BY word""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("word"))
      .groupBy("word")
      .agg(
        count(lit(1)).as("df"),
        // heap ranks by score desc = (-doc_id) desc = doc_id asc, so the
        // emitted struct array IS the lowest-100 ids in ascending order
        graft.functions.TopKAgg.top_k_agg(
          -col("doc_id").cast("double"), col("doc_id"), 100).as("tk"))
      .select(col("word"), col("df"),
        array_join(
          transform(col("tk"), x => x.getField("id").cast("long").cast("string")),
          ",").as("postings"))
      .orderBy("word")
  }

  val all: Seq[QueryDef] = Seq(
    qTextStats, qLangId, qTextTf, qTextFingerprint, qTextTfidf, qQualityFilter,
    qTextTokens, qBpeTrain, qBpeEncode, qLmScore, qBm25Search, qInvertedIndex)
}
