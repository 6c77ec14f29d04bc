package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Sanity specs for the LLM-pipeline operators: planted duplicates are
  * found, similarity results are geometrically correct, multimodal
  * plumbing preserves batch shape. (Value-level correctness is covered by
  * the DuckDB oracle gate; these pin down semantics the oracle can't.) */
class OperatorSpec extends SparkSpec {

  test("exact dedup finds every planted exact copy, and nothing else") {
    val groups = Dedup.qDedupExact.fn(spark, sf()).collect()
    val dupGroups = groups.filter(_.getAs[Long]("n_copies") > 1)
    // planted: doc_id % 7 == 0 copies (near-dups differ textually)
    val docs = Tables.documents(spark, sf()).count()
    val expected = (0L until docs).count(_ % 7 == 0)
    assert(dupGroups.length == expected)
    assert(dupGroups.forall(_.getAs[Long]("n_copies") == 2))
  }

  test("minhash candidates cover all planted near-dup and exact pairs") {
    val pairs = Dedup.qDedupMinhash.fn(spark, sf()).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val docs = Tables.documents(spark, sf()).count()
    val exactPairs = (0L until docs).filter(_ % 7 == 0).map(i => (i, i + 2000000))
    // every exact copy must collide on all bands; near-dups on >=1 band whp
    exactPairs.foreach(p => assert(pairs.contains(p), s"missing exact pair $p"))
    val nearExpected = (0L until docs).filter(_ % 5 == 0).map(i => (i, i + 1000000))
    val nearFound = nearExpected.count(pairs.contains)
    assert(nearFound >= nearExpected.size * 8 / 10,
      s"LSH should catch >=80% of 90%-overlap near-dups, got $nearFound/${nearExpected.size}")
  }

  test("ngram jaccard: exact pairs score 1.0, near-dups high, others lower") {
    val rows = Dedup.qDedupNgram.fn(spark, sf()).collect()
    val byPair = rows.map(r =>
      (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Double]("jaccard")).toMap
    byPair.collect { case ((a, b), j) if b == a + 2000000 => j }
      .foreach(j => assert(j == 1.0))
    assert(byPair.collect { case ((a, b), j) if b == a + 1000000 => j }
      .forall(j => j >= 0.5))
  }

  test("embedding near-dup finds exactly the planted colinear vectors") {
    val rows = Similarity.qEmbedNeardup.fn(spark, sf()).collect()
    val planted = rows.filter(r => r.getAs[Long]("b") == r.getAs[Long]("a") + 100000)
    assert(planted.forall(_.getAs[Double]("cos") == 1.0))
    val embCount = Tables.embeddings(spark, sf()).count()
    assert(planted.length == (0L until embCount).count(_ % 10 == 0))
  }

  test("semantic dedup drops exactly the planted colinear copies") {
    // the scaled (+100000-id) copies are colinear with their originals, so
    // cosine-max cell assignment puts each copy in its original's cell and
    // the in-cell pass must drop it; every original (lower id) survives
    val rows = Similarity.qSemanticDedup.fn(spark, sf()).collect()
    val dropped = rows.filter(!_.getAs[Boolean]("kept")).map(_.getAs[Long]("vec_id")).toSet
    val embCount = Tables.embeddings(spark, sf()).count()
    val planted = (0L until embCount).filter(_ % 10 == 0).map(_ + 100000L).toSet
    assert(dropped == planted,
      s"expected exactly the planted copies dropped; diff=${dropped.diff(planted) ++ planted.diff(dropped)}")
  }

  test("sim topk: neighbors sorted desc, no self-matches, k rows per query") {
    val rows = Similarity.qSimTopk.fn(spark, sf()).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == (0L until 10).toSet)
    byQ.values.foreach { g =>
      assert(g.length == 10)
      val cosines = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
      assert(g.forall(r => r.getAs[Long]("nid") != r.getAs[Long]("qid")))
    }
  }

  test("multimodal: real imageio decode recovers dims and exact channel means") {
    val media = Multimodal.mediaTable(spark, sf()).collect()
    assert(media.length == Tables.documents(spark, sf()).count())
    // the binary column holds genuine container bytes, both formats present
    assert(media.exists(_.fmt == "png") && media.exists(_.fmt == "bmp"))
    media.take(5).foreach { m =>
      val magicPng = m.media.take(4).sameElements(Array(0x89, 'P', 'N', 'G').map(_.toByte))
      val magicBmp = m.media.take(2).sameElements("BM".getBytes)
      assert(if (m.fmt == "png") magicPng else magicBmp, s"doc ${m.doc_id}: bad ${m.fmt} magic")
    }

    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf())).collect()
    feats.foreach { f =>
      assert(f.channels == 3)
      assert(f.n_bytes > 0)
      // decoded per-channel means are exactly the doc_id-derived fill color
      assert(f.mean_r == (f.doc_id % 256).toDouble, s"doc ${f.doc_id} mean_r")
      assert(f.mean_g == (f.doc_id * 7 % 256).toDouble)
      assert(f.mean_b == (f.doc_id * 13 % 256).toDouble)
    }
    // decoded dims match the metadata the image was encoded from
    val meta = media.map(m => m.doc_id -> ((m.width, m.height))).toMap
    feats.foreach(f => assert((f.width, f.height) == meta(f.doc_id),
      s"doc ${f.doc_id}: decoded dims must match metadata"))
  }

  test("subword_count: greedy longest-prefix segmentation; expression matches host") {
    import graft.functions.SubwordCount
    // greedy rule: longest unit wins at each position, chars fall back to 1
    assert(SubwordCount.countWord("") == 0)
    assert(SubwordCount.countWord("x") == 1)
    assert(SubwordCount.countWord("the") == 1)    // one 3-gram unit
    assert(SubwordCount.countWord("ment") == 1)   // the 4-gram, not "me"+"nt"
    assert(SubwordCount.countWord("customer") == 5) // c,u,st,om,er
    assert(SubwordCount.countWord("Q9") == 2)     // out-of-vocab chars: 1 each
    // the Catalyst expression (codegen path) agrees with the host function
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val words = Seq("the", "customer", "segmentation", "x", "").toDF("w")
    val got = words.select(col("w"), SubwordCount.subword_count(col("w")).as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    got.foreach { case (w, c) => assert(c == SubwordCount.countWord(w), s"'$w'") }
    // property: every unit covers 1..4 chars, so ceil(len/4) <= cnt <= len
    val rng = new scala.util.Random(20260812L)
    (1 to 200).foreach { _ =>
      val len = rng.nextInt(24) + 1
      val w = Seq.fill(len)(('a' + rng.nextInt(26)).toChar).mkString
      val c = SubwordCount.countWord(w)
      assert(c >= (len + 3) / 4 && c <= len, s"'$w' ($len chars) -> $c units")
    }
  }

  test("multimodal: undecodable media fails loudly, not with fake features") {
    intercept[IllegalArgumentException] {
      Multimodal.decode("definitely not an image".getBytes)
    }
  }

  test("average-hash: format-independent, stable under brightness shift") {
    import graft.operators.Multimodal
    // lossless codecs must hash identically: the hash reads pixels, not bytes
    val png = Multimodal.averageHash(Multimodal.encodeGradient(10L, 33, 25, "png"))
    val bmp = Multimodal.averageHash(Multimodal.encodeGradient(10L, 33, 25, "bmp"))
    assert(png == bmp, "pixel-identical png/bmp must collide")
    // a global brightness shift (adjacent doc ids shift all channels
    // uniformly, away from the mod-256 wrap) moves the mean with the
    // samples: a perceptual near-duplicate, within a few Hamming bits
    val shifted = Multimodal.averageHash(Multimodal.encodeGradient(11L, 33, 25, "png"))
    assert(java.lang.Long.bitCount(png ^ shifted) <= 8,
      s"brightness shift flipped ${java.lang.Long.bitCount(png ^ shifted)} bits")
  }

  test("average-hash: robust to lossy JPEG re-encode (the actual near-dup claim)") {
    import graft.operators.Multimodal
    // real corpora are JPEG: the same image re-encoded lossily (ImageIO
    // default quality) must stay inside the banding budget simhashPairs
    // searches with (maxHamming = 8) — measured ≤ 3 bits on these cases,
    // asserted at the budget so codec noise has headroom
    for (id <- Seq(1L, 7L, 42L, 123L, 999L); (w, h) <- Seq((64, 48), (33, 17), (8, 8))) {
      val lossless = Multimodal.averageHash(Multimodal.encodeGradient(id, w, h, "png"))
      val jpeg = Multimodal.averageHash(Multimodal.encodeGradient(id, w, h, "jpg"))
      val d = java.lang.Long.bitCount(lossless ^ jpeg)
      assert(d <= 8, s"id=$id ${w}x$h: jpeg re-encode drifted $d bits from lossless")
    }
  }

  test("audio: real WAV container round-trip recovers exact PCM, fails loudly on junk") {
    import graft.operators.Multimodal
    val wav = Multimodal.encodeWav(42L, 100)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
      "encode must produce a genuine WAV container")
    val (n, rate, ch, peak, rms) = Multimodal.decodeWav(wav)
    assert(n == 100 && rate == 8000 && ch == 1)
    // decoded stats equal the closed form the samples were generated from
    val samples = (0 until 100).map(k => ((42L * 31 + k.toLong * 17) % 65536 - 32768).toInt)
    assert(peak == samples.map(math.abs).max)
    assert(rms == math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / 100))
    intercept[Exception] { Multimodal.decodeWav(Array.fill(64)(7.toByte)) }
  }

  test("property: codec round-trips hold across generated ids/dims (incl. sub-lattice images)") {
    import graft.operators.Multimodal
    val rng = new scala.util.Random(20260812L) // deterministic cases
    (1 to 25).foreach { _ =>
      val id = rng.nextLong().abs % 1000000
      val w = rng.nextInt(70) + 1 // includes w < 8: lattice degenerates, must not crash
      val h = rng.nextInt(50) + 1
      // image: pixel-identical encodes hash identically in both lossless formats
      val a = Multimodal.averageHash(Multimodal.encodeGradient(id, w, h, "png"))
      val b = Multimodal.averageHash(Multimodal.encodeGradient(id, w, h, "bmp"))
      assert(a == b, s"id=$id w=$w h=$h: png/bmp hash mismatch")
      // audio: decoded stats equal the closed form for arbitrary lengths
      val n = rng.nextInt(500) + 1
      val (dn, _, _, peak, rms) = Multimodal.decodeWav(Multimodal.encodeWav(id, n))
      val samples = (0 until n).map(k => ((id * 31 + k.toLong * 17) % 65536 - 32768).toInt)
      assert(dn == n && peak == samples.map(math.abs).max &&
        rms == math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / n),
        s"id=$id n=$n: wav round-trip mismatch")
    }
  }

  test("gapfill: dense contiguous hour grid per series, LOCF never null") {
    val rows = operators.Analytic.qGapfill.fn(spark, sf()).collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.keySet == Set("purchase", "error"))
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:00")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    byType.foreach { case (t, rs) =>
      val hours = rs.map(r => fmt.parse(r.getString(1)).getTime)
      // contiguous: every consecutive grid step is exactly one hour
      assert(hours.sliding(2).forall { case Array(a, b) => b - a == 3600000L },
        s"$t grid has holes")
      // genuinely sparse input: the grid must contain filled zeros
      assert(rs.exists(_.getLong(2) == 0L), s"$t has no gap to fill")
      // LOCF: first row is an observation, then never null
      assert(rs.forall(!_.isNullAt(3)), s"$t locf produced nulls")
    }
  }

  test("sources: csv and json round-trip the star schema with explicit schemas") {
    import org.apache.spark.sql.functions._
    // source-format breadth: the same relation read back from csv and
    // json lines must match the parquet original bit-for-bit. Explicit
    // schemas everywhere — schema inference is a full extra pass over the
    // data at 100 TB and type-guesses timestamps/decimals wrong.
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val orig = Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    orig.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    orig.write.mode("overwrite").json(s"$dir/json")
    val schema = orig.schema
    val fromCsv = spark.read.schema(schema).option("header", "true").csv(s"$dir/csv")
    val fromJson = spark.read.schema(schema).json(s"$dir/json")
    assert(fromCsv.count() == orig.count() && fromJson.count() == orig.count())
    // full-row equality via anti-joins in both directions
    Seq(fromCsv, fromJson).foreach { back =>
      assert(back.join(orig, orig.columns.toSeq, "left_anti").isEmpty,
        "rows appeared that the parquet original does not have")
      assert(orig.join(back, orig.columns.toSeq, "left_anti").isEmpty,
        "rows lost in the format round-trip")
    }
    assert(fromCsv.schema == schema && fromJson.schema == schema)
  }

  test("sources: orc round-trips the star schema including timestamps") {
    // orc is the remaining built-in columnar format (csv/json above,
    // parquet everywhere): unlike text formats it preserves types on its
    // own, so the round-trip must hold WITHOUT re-imposing a schema —
    // including the timestamp column the csv/json case leaves out
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val orig = Tables.orders(spark, sf())
    orig.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.schema == orig.schema, s"orc changed the schema: ${back.schema}")
    assert(back.count() == orig.count())
    assert(back.join(orig, orig.columns.toSeq, "left_anti").isEmpty &&
      orig.join(back, orig.columns.toSeq, "left_anti").isEmpty,
      "orc round-trip lost or invented rows")
  }

  test("frame sampling covers the byte range in order") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.frameSample(bytes, 4)
    assert(frames.length == 4)
    assert(frames.flatten.toSeq == bytes.toSeq)
  }
}
