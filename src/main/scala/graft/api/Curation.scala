package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between ingest
  * and dedup: repetition profiling (Gopher-style quality signals),
  * overlapping token-window chunking, benchmark decontamination, and
  * sketch-pruned heavy-hitter extraction.
  *
  * Scale shape (100 TB): everything here is a narrow per-row projection or
  * a map-side-combined aggregate keyed by an 8-byte id — document text
  * never enters a shuffle key. Decontamination broadcasts the (small) eval
  * fingerprint set against the full training shingle stream, the published
  * n-gram-overlap decontamination shape; heavy hitters run a fixed-size
  * sketch pass first so the exact groupBy only shuffles candidate rows.
  */
object Curation {

  /** Per-document repetition signals (the Gopher repetition rules, word
    * level): fraction of tokens taken by the single most frequent word,
    * and the duplicate fraction of word 2-grams / 3-grams. Two aggregates
    * keyed by the document id; n-grams are built with posexplode + window
    * `lead` so the whole stage stays codegen'd (HOF lambdas are
    * interpreted — see operators/Corpora.scala).
    *
    * Returns (id, n_tokens, top_word_frac, dup_bigram_frac,
    * dup_trigram_frac) with UNROUNDED fractions — callers round at their
    * output boundary.
    */
  def repetitionSignals(df: DataFrame, id: Column, text: Column): DataFrame = {
    val win = Window.partitionBy("id").orderBy("pos")
    val toks = df.select(id.as("id"), posexplode(split(text, " ")).as(Seq("pos", "w0")))
    val grams = toks
      .withColumn("w1", lead(col("w0"), 1).over(win))
      .withColumn("w2", lead(col("w0"), 2).over(win))
      .withColumn("bg", when(col("w1").isNotNull, concat_ws(" ", col("w0"), col("w1"))))
      .withColumn("tg", when(col("w2").isNotNull,
        concat_ws(" ", col("w0"), col("w1"), col("w2"))))
    val gramAgg = grams.groupBy("id").agg(
      count(col("w1")).as("n_bg"),
      count_distinct(col("bg")).as("d_bg"),
      count(col("w2")).as("n_tg"),
      count_distinct(col("tg")).as("d_tg"))
    val wordAgg = toks.groupBy("id", "w0").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(sum(col("c")).as("n_tok"), max(col("c")).as("top_c"))
    wordAgg.join(gramAgg, "id").select(
      col("id"),
      col("n_tok").cast("int").as("n_tokens"),
      (col("top_c").cast("double") / col("n_tok")).as("top_word_frac"),
      when(col("n_bg") > 0,
        lit(1.0) - col("d_bg").cast("double") / col("n_bg")).otherwise(0.0)
        .as("dup_bigram_frac"),
      when(col("n_tg") > 0,
        lit(1.0) - col("d_tg").cast("double") / col("n_tg")).otherwise(0.0)
        .as("dup_trigram_frac"))
  }

  /** Overlapping token-window chunking: split each document into windows
    * of `size` tokens starting every `stride` tokens (stride < size ⇒
    * overlap of size - stride tokens, the shape an embedding/training
    * pipeline feeds a fixed-context model). Start offsets are
    * `sequence(0, n_tokens - 1, stride)` — every token lands in at least
    * one chunk; the final chunk may be short.
    *
    * Pure per-row projection (sequence + posexplode + slice, all
    * codegen'd — no HOF lambdas, no shuffle): at 100 TB chunking is a
    * map-only stage that pipelines into whatever consumes the chunks.
    *
    * Returns (id, chunk_id, n_toks, chunk).
    */
  def chunk(df: DataFrame, id: Column, text: Column,
      size: Int = 32, stride: Int = 24): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    df.select(id.as("id"), split(text, " ").as("w"))
      .select(col("id"), col("w"),
        posexplode(sequence(lit(0), org.apache.spark.sql.functions.size(col("w")) - 1,
          lit(stride))).as(Seq("chunk_id", "start")))
      .select(
        col("id"),
        col("chunk_id"),
        least(org.apache.spark.sql.functions.size(col("w")) - col("start"), lit(size))
          .as("n_toks"),
        array_join(slice(col("w"), col("start") + 1, lit(size)), " ").as("chunk"))
  }

  /** Content-defined chunking (the rsync/LBFS boundary trick): a chunk
    * boundary falls BEFORE token i exactly when `md5Long(w[i]) % p == 0`
    * (i ≥ 1), so boundaries derive from the tokens themselves, never from
    * document offsets. A span duplicated across documents at DIFFERENT
    * offsets therefore chunks identically in every copy — the property
    * fixed-grid chunking ([[chunk]]) lacks, and the reason this is the
    * carrier for suffix-granularity exact-substring dedup
    * (`q_span_dedup`). Expected chunk length is `p` tokens.
    *
    * Pure per-row projection: token-hash + boundary filter + slice are
    * array HOFs over the split column — no shuffle, text never leaves the
    * map stage. The hash is [[graft.functions.CrossHash.md5Long]], so a
    * SQL oracle replays boundaries bit-identically.
    *
    * Returns (id, chunk_id, n_toks, chunk).
    */
  def cdcChunk(df: DataFrame, id: Column, text: Column, p: Int = 16): DataFrame = {
    require(p >= 2, s"boundary modulus must be >= 2, got $p")
    import org.apache.spark.sql.functions.{size => asize}
    df.select(id.as("id"), split(text, " ").as("w"))
      .select(col("id"), col("w"),
        // ascending boundary positions, always including 0 and n_tokens
        concat(
          array(lit(0)),
          filter(
            transform(col("w"), (x, i) =>
              when(i >= 1 && graft.functions.CrossHash.md5Long(x) % p === 0, i)
                .otherwise(lit(-1))),
            v => v =!= -1),
          array(asize(col("w")))).as("b"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), asize(col("b")) - 2), j =>
          struct(
            (element_at(col("b"), j + 2) - element_at(col("b"), j + 1))
              .as("n_toks"),
            array_join(
              slice(col("w"), element_at(col("b"), j + 1) + 1,
                element_at(col("b"), j + 2) - element_at(col("b"), j + 1)),
              " ").as("chunk")))).as(Seq("chunk_id", "c")))
      .select(col("id"), col("chunk_id"),
        col("c.n_toks").as("n_toks"), col("c.chunk").as("chunk"))
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * one word n-gram with an evaluation set. `evalIds` marks the eval
    * slice inside `df`; the result is (id, n_shared) for every NON-eval
    * document with ≥1 shingle-hash overlap (n_shared counts its distinct
    * overlapping shingles).
    *
    * Shape: shingle-hash both sides once ([[TextDedup.shingleHashes]] —
    * codegen'd, text leaves the plan immediately), then broadcast the
    * DISTINCT eval fingerprints against the training stream. The eval set
    * is benchmarks — thousands of documents against a 100 TB corpus — so
    * the broadcast is small and the contamination check is a map-side
    * semi-join: no shuffle touches the corpus until the final per-doc
    * count, which carries only (8-byte id, 8-byte hash) survivors.
    */
  def decontaminate(df: DataFrame, id: Column, text: Column, isEval: Column,
      n: Int = 3): DataFrame = {
    val marked = df.select(id.as("__id"), text.as("__text"), isEval.as("__eval"))
    val hashes = TextDedup.shingleHashes(marked, col("__id"), col("__text"), n)
      .join(marked.select(col("__id").as("id"), col("__eval")), "id")
    val evalFps = hashes.where(col("__eval")).select("hv").distinct()
    hashes.where(!col("__eval"))
      .join(broadcast(evalFps), "hv")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
  }

  /** Heavy hitters with a sketch-prune → exact-verify plan: corpus words
    * whose exact count is ≥ `pct` percent of all tokens.
    *
    * Pass 1 runs Spark's single-pass frequent-items sketch
    * (`stat.freqItems`, Karp et al.) at HALF the target support — its
    * superset guarantee (every item with frequency > support survives)
    * then covers the ≥ pct boundary exactly, so false NEGATIVES are
    * impossible and false positives die in the exact pass. Pass 2 counts
    * ONLY candidate words: the filter is an `isin` over ≤ 2/support
    * literals (codegen'd InSet), so the groupBy shuffles the heavy keys
    * and nothing else. At 100 TB the sketch pass is fixed memory
    * (2/support counters per partition) and the exact pass's shuffle is
    * proportional to the answer, not the vocabulary.
    *
    * Output (word, cnt, frac) is EXACT and deterministic regardless of
    * which extra candidates the sketch emitted. `pct` is integer percent
    * so thresholding is pure integer arithmetic (cnt * 100 >= total).
    */
  def heavyHitters(df: DataFrame, text: Column, pct: Int = 1): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be 1..100, got $pct")
    val toks = df.select(explode(split(text, " ")).as("word"))
    val candidates: Seq[String] = toks.stat.freqItems(Seq("word"), pct / 200.0)
      .head().getSeq[String](0)
    val total = toks.agg(count(lit(1)).as("total"))
    toks.where(col("word").isin(candidates: _*))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * 100 >= col("total") * pct)
      .select(col("word"), col("cnt"),
        (col("cnt").cast("double") / col("total")).as("frac"))
  }

  /** PII redaction: replace e-mail addresses, phone numbers and long digit
    * runs with typed placeholder tags, in that order (e-mails first so
    * their digits aren't half-eaten by the digit-run rule). Patterns stay
    * in the POSIX-compatible subset where Java regex and RE2 agree. Pure
    * per-row projection — three chained codegen'd `regexp_replace`s, no
    * shuffle, linear scan at any scale.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "[a-z0-9._]+@[a-z0-9.-]+", "[EMAIL]"),
        "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
      "[0-9]{5,}", "[ID]")

  /** Sequence packing for pretraining: the corpus's token stream (docs
    * concatenated in `id` order) is cut into fixed `capacity`-token bins,
    * and each document is mapped to its (start_bin, start_off, end_bin)
    * coordinates — documents cross bin boundaries, exactly like packed
    * pretraining batches.
    *
    * The global prefix sum is computed in the scalable TWO-PHASE shape,
    * not one unpartitioned window (whose parallelism is a single
    * reducer): (1) per-bucket token totals (`id div bucketSize`), (2) a
    * model-sized running total over bucket ids, (3) a within-bucket
    * running total partitioned by bucket — the classic distributed
    * prefix-sum expressed relationally. All integer arithmetic.
    */
  def pack(df: DataFrame, id: Column, text: Column,
      capacity: Int = 512, bucketSize: Int = 100): DataFrame = {
    require(capacity >= 1 && bucketSize >= 1, "bad pack params")
    val toks = df.select(id.as("id"),
      size(split(text, " ")).cast("long").as("n"))
      .withColumn("bucket", expr(s"id div $bucketSize"))
    val boff = toks.groupBy("bucket").agg(sum(col("n")).as("bn"))
      .withColumn("boff",
        coalesce(sum(col("bn")).over(
          org.apache.spark.sql.expressions.Window.orderBy("bucket")
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select("bucket", "boff")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("id")
    toks.join(boff, "bucket")
      .withColumn("wcum", sum(col("n")).over(w))
      .withColumn("sprev", col("boff") + col("wcum") - col("n"))
      .select(
        col("id"), col("n").as("n_tokens"),
        expr(s"sprev div $capacity").as("start_bin"),
        expr(s"sprev % $capacity").as("start_off"),
        expr(s"(sprev + n - 1) div $capacity").as("end_bin"))
      .withColumn("spans_bins", col("end_bin") > col("start_bin"))
  }
}
