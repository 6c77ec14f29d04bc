package graft

import graft.api.Curation
import org.apache.spark.sql.functions._

/** Unit tests for the curation suite (api/Curation.scala): planted-case
  * semantics plus the plan shapes the 100 TB story depends on.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- repetition signals ------------------------------------------------

  test("repetition: planted loop dominates every signal; clean doc stays clean") {
    val d = docs(
      1L -> "spam spam spam spam spam spam spam spam",
      2L -> "one two three four five six seven eight")
    val r = Curation.repetitionSignals(d, col("doc_id"), col("text"))
      .orderBy("id").collect()

    val loop = r(0)
    assert(loop.getAs[Int]("n_tokens") == 8)
    assert(loop.getAs[Double]("top_word_frac") == 1.0)
    assert(loop.getAs[Double]("dup_bigram_frac") == 1.0 - 1.0 / 7)
    assert(loop.getAs[Double]("dup_trigram_frac") == 1.0 - 1.0 / 6)

    val clean = r(1)
    assert(clean.getAs[Double]("top_word_frac") == 1.0 / 8)
    assert(clean.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(clean.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("repetition: single-word doc has zero gram fractions, not NaN") {
    val r = Curation.repetitionSignals(docs(1L -> "solo"), col("doc_id"), col("text"))
      .collect()(0)
    assert(r.getAs[Int]("n_tokens") == 1)
    assert(r.getAs[Double]("top_word_frac") == 1.0)
    assert(r.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  // ---- chunking ----------------------------------------------------------

  test("chunk: windows cover every token; overlap is size - stride") {
    val words = (1 to 100).map(i => s"w$i")
    val d = docs(1L -> words.mkString(" "))
    val chunks = Curation.chunk(d, col("doc_id"), col("text"), size = 32, stride = 24)
      .orderBy("chunk_id").collect()

    // starts at 0, 24, 48, 72, 96 -> 5 chunks
    assert(chunks.length == 5)
    assert(chunks.map(_.getAs[Int]("n_toks")).toSeq == Seq(32, 32, 32, 28, 4))
    // every chunk is the exact slice of the source
    chunks.foreach { c =>
      val start = c.getAs[Int]("chunk_id") * 24
      val expect = words.slice(start, start + 32).mkString(" ")
      assert(c.getAs[String]("chunk") == expect)
    }
    // coverage: union of [start, start+size) is [0, 100)
    val covered = chunks.flatMap { c =>
      val start = c.getAs[Int]("chunk_id") * 24
      start until (start + c.getAs[Int]("n_toks"))
    }.toSet
    assert(covered == (0 until 100).toSet)
  }

  test("chunk: doc shorter than one window is a single short chunk") {
    val chunks = Curation.chunk(docs(1L -> "a b c"), col("doc_id"), col("text"),
      size = 32, stride = 24).collect()
    assert(chunks.length == 1)
    assert(chunks(0).getAs[Int]("n_toks") == 3)
    assert(chunks(0).getAs[String]("chunk") == "a b c")
  }

  test("chunk plan: map-only — no shuffle anywhere") {
    val d = Tables.documents(spark, sf())
    val p = Curation.chunk(d, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking should be a narrow projection:\n$p")
  }

  // ---- decontamination ---------------------------------------------------

  test("cdcChunk: boundaries are offset-invariant — a shifted span chunks identically") {
    // the same 64-token span embedded at offset 0 in doc 1 and offset 7 in
    // doc 2: a fixed 32/24 grid slices the two copies differently (7 ≢ 0
    // mod 24), but content-defined boundaries depend only on the tokens.
    // Every 10th span token is a precomputed boundary token
    // (md5Long % 16 == 0), so the span is guaranteed interior chunks.
    val boundaryToks = Seq("b9", "b46", "b108", "b111", "b118", "b162")
    val span = (0 until 64).map { i =>
      if (i % 10 == 9) boundaryToks(i / 10) else s"w$i"
    }.mkString(" ")
    val prefix = (0 until 7).map(i => s"pre$i").mkString(" ")
    val suffix = (0 until 9).map(i => s"post$i").mkString(" ")
    val d = docs(1L -> s"$span $suffix", 2L -> s"$prefix $span")

    // fixed-grid chunks share NOTHING across the two docs (misaligned)
    val grid = Curation.chunk(d, col("doc_id"), col("text"), size = 32, stride = 24)
      .filter(col("n_toks") === 32)
      .select(md5(col("chunk")).as("dig"), col("id"))
    val gridShared = grid.groupBy("dig")
      .agg(countDistinct("id").as("nd")).filter(col("nd") > 1).count()
    assert(gridShared == 0,
      "fixed grid unexpectedly aligned — pick a different planted offset")

    // CDC chunks: the span's interior chunks digest identically in both
    val cdc = Curation.cdcChunk(d, col("doc_id"), col("text"), p = 16)
      .select(md5(col("chunk")).as("dig"), col("id"))
    val cdcShared = cdc.groupBy("dig")
      .agg(countDistinct("id").as("nd")).filter(col("nd") > 1).count()
    assert(cdcShared >= 1,
      "content-defined chunking must surface the shifted duplicate span")

    // chunks partition each document: concatenating them restores the text
    val restored = Curation.cdcChunk(d, col("doc_id"), col("text"), p = 16)
      .orderBy("id", "chunk_id")
      .collect().groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.map(_.getAs[String]("chunk")).mkString(" ")).toMap
    assert(restored(1L) == s"$span $suffix" && restored(2L) == s"$prefix $span",
      "cdc chunks must partition the token stream")
  }

  test("decontaminate: flags only true n-gram overlap, counts distinct shingles") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon", true),   // eval
      (2L, "zeta eta theta iota kappa", false),        // clean train
      (3L, "noise alpha beta gamma tail", false),      // one shared 3-gram
      (4L, "alpha beta gamma delta junk", false)       // two shared 3-grams
    ).toDF("doc_id", "text", "is_eval")
    val r = Curation.decontaminate(d, col("doc_id"), col("text"), col("is_eval"))
      .orderBy("id").collect()
    assert(r.map(x => (x.getAs[Long]("id"), x.getAs[Long]("n_shared"))).toSeq ==
      Seq((3L, 1L), (4L, 2L)))
  }

  test("decontaminate plan: eval fingerprints broadcast, corpus not reshuffled for the probe") {
    val d = Tables.documents(spark, sf())
    val p = Curation.decontaminate(d, col("doc_id"), col("text"),
        col("source") === "src0")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"eval-set probe should be a broadcast join:\n$p")
  }

  // ---- heavy hitters -----------------------------------------------------

  test("heavyHitters: exact counts, exact threshold, sketch extras filtered out") {
    // 100 tokens: "hot" x 30, "warm" x 10, 60 distinct cold words.
    val text = (Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
      (1 to 60).map(i => s"cold$i")).mkString(" ")
    val r = Curation.heavyHitters(docs(1L -> text), col("text"), pct = 10)
      .orderBy(col("cnt").desc).collect()
    assert(r.map(x => (x.getAs[String]("word"), x.getAs[Long]("cnt"))).toSeq ==
      Seq(("hot", 30L), ("warm", 10L)))  // warm == exactly 10% kept
    assert(r(0).getAs[Double]("frac") == 0.30)
  }

  // ---- PII scrub ---------------------------------------------------------

  test("scrubPii: masks emails, phones, digit runs; leaves clean text alone") {
    val rows = Seq(
      "mail me at john.doe99@corp.example.org today",
      "call +1-555-0199 or 44-555-0100 now",
      "order 1234567890 shipped, ref 44",
      "nothing sensitive here").toDF("t")
    val out = rows.select(Curation.scrubPii(col("t")).as("s")).as[String].collect()
    assert(out(0) == "mail me at [EMAIL] today")
    assert(out(1) == "call [PHONE] or [PHONE] now")
    assert(out(2) == "order [ID] shipped, ref 44")
    assert(out(3) == "nothing sensitive here")
  }

  test("scrubPii: no digits of an email or phone survive partial masking") {
    val out = Seq("a1b2@x.io +9-123-4567 123456")
      .toDF("t").select(Curation.scrubPii(col("t")).as("s")).as[String].collect()(0)
    assert(out == "[EMAIL] [PHONE] [ID]")
  }

  test("pack: contiguous gapless token stream, bin capacity respected") {
    val rows = graft.operators.Curation_.qPack.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    // documents tile the token stream exactly: doc i+1 starts where doc i
    // ended, the first doc starts at (0, 0), offsets stay < capacity
    var expectStart = 0L
    rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
      val start = r.getAs[Long]("start_bin") * 512 + r.getAs[Long]("start_off")
      assert(start == expectStart, s"gap before doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("start_off") >= 0 && r.getAs[Long]("start_off") < 512)
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("end_bin") == (start + n - 1) / 512)
      assert(r.getAs[Boolean]("spans_bins") ==
        (r.getAs[Long]("end_bin") > r.getAs[Long]("start_bin")))
      expectStart = start + n
    }
  }

  test("lm score: rare-token documents score above boilerplate") {
    val rows = Sequence_LmFixture.write(spark)
    val out = graft.operators.TextAnalysis.qLmScore.fn(spark, rows).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    // doc 1 = the common word repeated; doc 2 = four unique words
    assert(out(1L) < out(2L),
      s"boilerplate must score below rare text: $out")
  }

  test("domain cap: over-cap domain keeps the 5 longest (ties → low id), tail passes through") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("domaincap").toString
    // big domain: 8 docs, n_chars 10,20,...,70 plus a TIE at 70 (ids 107,108):
    // keep-set by (n_chars DESC, doc_id ASC) = 107,108 (70), 106 (60), 105 (50), 104 (40)
    val big = (1 to 7).map(i => (100L + i, s"doc $i", "en", "srcBig", i * 10L)) :+
      ((108L, "doc 8", "en", "srcBig", 70L))
    // tail domain: 3 docs, all kept untouched
    val tail = (1 to 3).map(i => (200L + i, s"t $i", "de", "srcTail", 5L))
    (big ++ tail).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.operators.Curation_.qDomainCap.fn(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toList
    assert(kept == List(104L, 105L, 106L, 107L, 108L, 201L, 202L, 203L),
      s"unexpected keep-set: $kept")
  }

  test("curate pipeline: first-dropping-stage attribution, stages compose on survivors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curatepipe").toString
    // quality-passing text generator: 4 stopwords + n doubled unique words
    // → n_tokens = 4+2n (≥20 for n≥8), ttr = (4+n)/(4+2n) ≈ 0.55, stop_r ok
    def good(tag: String, n: Int) =
      "the and of to " + (1 to n).map(i => s"${tag}w$i").mkString(" ") +
        " " + (1 to n).map(i => s"${tag}w$i").mkString(" ")
    val rows = Seq(
      // srcA/en: five passing docs, lengths strictly increasing with id →
      // cap (K=3 over survivors) drops ids 1,2
      (1L, good("a1", 8), "en", "srcA"),
      (2L, good("a2", 9), "en", "srcA"),
      (3L, good("a3", 10), "en", "srcA"),
      (4L, good("a4", 11), "en", "srcA"),
      (5L, good("a5", 12), "en", "srcA"),
      // id 7 (%7==0): passing → its +2000007 auto-copy must read 'dup'
      (7L, good("b", 10), "en", "srcB"),
      // id 14 (%7==0): failing → BOTH 14 and its copy read 'quality'
      // (quality precedes dup in the attribution order)
      (14L, "tiny doc", "en", "srcB"))
    rows.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Curation_.qCuratePipeline.fn(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stage")).toMap
    val expected = Map(
      1L -> "domain_cap", 2L -> "domain_cap", 3L -> "kept", 4L -> "kept",
      5L -> "kept", 7L -> "kept", 14L -> "quality",
      2000007L -> "dup", 2000014L -> "quality")
    assert(out == expected, s"attribution diverged: $out")
  }

  test("train split: partitions the corpus, ~90/5/5, and is rerun-stable") {
    val census = operators.Curation_.qTrainSplit.fn(spark, sf()).collect()
    val docs = Tables.documents(spark, sf())
    val n = docs.count()
    assert(census.map(_.getAs[Long]("n_docs")).sum == n,
      "splits must partition the corpus exactly")
    val bySplit = census.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"splits: ${bySplit.keySet}")
    val trainFrac = bySplit("train").toDouble / n
    assert(trainFrac > 0.80 && trainFrac < 0.97, s"train fraction $trainFrac off 0.9")
    // deterministic: a rerun yields the identical census (hash-split, no rng)
    val again = operators.Curation_.qTrainSplit.fn(spark, sf()).collect()
    assert(census.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}

/** Tiny documents table fixture for the LM-score semantics test. */
private object Sequence_LmFixture {
  def write(spark: org.apache.spark.sql.SparkSession): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lmscore").toString
    Seq(
      (1L, "common common common common", "en", "srcA", 27L),
      (2L, "quark zephyr oblique names", "en", "srcA", 26L),
      (3L, "common quark common zephyr", "en", "srcA", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}
