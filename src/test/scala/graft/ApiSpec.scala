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

  test("exactVerified detects (no) collisions and exposes the digest for repair") {
    val v = TextDedup.exactVerified(docs, col("article_id"), col("body"))
    assert(v.columns.toSeq == Seq("digest", "keep_id", "n_copies", "n_texts"))
    val rows = v.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getLong(3) == 1L), "md5-128 must not collide here")
    val dup = rows.find(_.getLong(1) == 1L).get
    assert(dup.getLong(2) == 2L) // ids 1 and 4 share one digest
    assert(dup.getAs[Array[Byte]]("digest").length == 16, "full 128-bit digest")
  }

  test("LSH bucket cap drops a degenerate identical-text flood, keeps real near-dups") {
    val flood = (1L to 1000L).map(i =>
      (i, "identical boilerplate disclaimer text repeated across this corpus verbatim"))
    val a = (2001L, "spark catalyst optimizer rewrites logical plans into efficient physical operators nightly")
    val b = (2002L, "spark catalyst optimizer rewrites logical plans into efficient physical operators daily")
    val c = (3001L, a._2) // exact copy of 2001 — a small (non-flood) bucket of its own
    val df = (flood :+ a :+ b :+ c).toDF("article_id", "body")

    // the flood is exact dedup's job — one keep row with 1000 copies
    val exact = TextDedup.exact(df, col("article_id"), col("body")).collect()
    assert(exact.exists(r => r.getLong(0) == 1L && r.getLong(1) == 1000L))

    // minhash: all 4 flood band-buckets have 1000 members -> dropped at cap 100;
    // without the cap this single bucket alone is 1000*999/2 = 499500 pairs
    val hashes = TextDedup.shingleHashes(df, col("article_id"), col("body"))
    val cand = TextDedup.candidatePairs(TextDedup.minhashBands(hashes), maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!cand.exists(p => p._1 <= 1000L && p._2 <= 1000L), "flood pairs must be dropped")
    assert(cand.contains((2001L, 2002L)), "real near-dup pair must survive the cap")

    // simhash: identical fingerprints -> identical band values -> same drop
    val fp = TextDedup.simhash(df, col("article_id"), col("body"))
    val sp = TextDedup.simhashPairs(fp, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!sp.exists(p => p._1 <= 1000L && p._2 <= 1000L), "flood pairs must be dropped")
    assert(sp.contains((2001L, 3001L)), "small-bucket dup pair must survive the cap")
  }

  test("nearDuplicates block cap drops a hot block, keeps small blocks") {
    // one hot block of 1000 mutually-colinear vectors (499500 pairs if
    // joined) + a small block with one planted colinear pair
    val flood = (1L to 1000L).map(i => (i, Array(1.0f, 0.0f), "hot"))
    val small = Seq(
      (2001L, Array(0.0f, 1.0f), "cool"),
      (2002L, Array(0.0f, 2.0f), "cool"), // colinear with 2001
      (2003L, Array(1.0f, 1.0f), "cool"))
    val df = (flood ++ small).toDF("item", "emb", "grp")
    val n = VectorSearch.withNorm(df, col("item"), col("emb"), col("grp"))
    val dups = VectorSearch.nearDuplicates(n, col("grp"), minCosine = 0.999, maxBlock = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set((2001L, 2002L)),
      "hot block dropped (quadratic guard), small-block pair survives")
  }

  test("candidate/near-dup plan construction launches no Spark job (lazy cap)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val hashes = TextDedup.shingleHashes(docs, col("article_id"), col("body"))
      TextDedup.candidatePairs(TextDedup.minhashBands(hashes))
      TextDedup.simhashPairs(TextDedup.simhash(docs, col("article_id"), col("body")))
      val vecs = Seq((1L, Array(1.0f, 0.0f), "x")).toDF("item", "emb", "grp")
      VectorSearch.nearDuplicates(
        VectorSearch.withNorm(vecs, col("item"), col("emb"), col("grp")),
        col("grp"), minCosine = 0.9)
      Thread.sleep(500) // let any stray listener events drain
      assert(jobs.get() == 0, "plan construction must not run an eager census job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("TopKAgg rejects wrong input types at analysis time") {
    val df = Seq((1, 1.0)).toDF("id_int", "score")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy().agg(graft.functions.TopKAgg.top_k_agg(
        col("score"), col("id_int"), 5)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("TopKAgg pipeline matches the row_number window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    // deterministic scores with planted ties: cos repeats every 17 values
    val scored = (for (q <- 0L until 4L; n <- 0L until 200L if n != q)
      yield (q, n, ((n * 31 + q * 7) % 17).toDouble / 17.0)).toDF("qid", "nid", "cos")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    val viaWindow = scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 10)
      .select(col("qid"), col("nid"), col("rnk"), round(col("cos"), 4).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val viaAgg = scored.groupBy("qid")
      .agg(graft.functions.TopKAgg.top_k_agg(col("cos"), col("nid"), 10).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("qid"), col("x.id").as("nid"),
        (col("pos") + 1).cast("int").as("rnk"), round(col("x.score"), 4).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
    // fewer rows than k: returns all, still ordered
    val tiny = Seq((9L, 1L, 0.5), (9L, 2L, 0.9)).toDF("qid", "nid", "cos")
    val t = tiny.groupBy("qid")
      .agg(graft.functions.TopKAgg.top_k_agg(col("cos"), col("nid"), 10).as("tk"))
      .select(posexplode(col("tk"))).collect()
    assert(t.length == 2 && t(0).getStruct(1).getLong(0) == 2L)
  }

  test("connectedComponents: chains, blobs, and isolated pairs converge to min id") {
    // components: {1,2,3,4} (a chain — needs >1 propagation round),
    // {10,11,12} (a triangle), {20,21} (one pair)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val cc = TextDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // empty edge set → empty result, no iteration explosion
    assert(TextDedup.connectedComponents(Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().isEmpty)
  }

  test("keepList: cluster minima and singletons keep, other members drop") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 8L).map(Tuple1(_)).toDF("doc")
    // clusters {1,2,3} and {5,6}; docs 4,7,8 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val keep = TextDedup.keepList(docs, col("doc"), pairs)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true,
      5L -> true, 6L -> false, 7L -> true, 8L -> true))
  }

  test("connectedComponents: driver union-find path equals the distributed fixpoint") {
    // the driverCutoff fast path must be label-identical to the
    // distributed loop on every structure class: chain, blob, pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (7L, 5L), (5L, 9L)).toDF("a", "b")
    val dist = TextDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drv = TextDedup.connectedComponents(edges, driverCutoff = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv == dist, s"driver union-find diverged: $drv vs $dist")
    // a graph larger than the cutoff falls through to the distributed loop
    val over = TextDedup.connectedComponents(edges, driverCutoff = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(over == dist, s"cutoff fall-through diverged: $over vs $dist")
  }

  test("connectedComponents collapses a 200-node path in a logarithmic budget") {
    // path 0-1-2-...-200: neighbor-only min-label would need ~200 rounds;
    // pointer jumping covers distance d' = 2d+1 per round, so 12 rounds
    // (2^12 > 200 with slack) must fully collapse it — this pins the
    // O(log diameter) claim, not just eventual correctness
    val path = (0L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = TextDedup.connectedComponents(path, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 201 && cc.values.toSet == Set(0L),
      s"path must collapse to one component: ${cc.filterNot(_._2 == 0L)}")
  }

  test("connectedComponents throws instead of returning non-converged labels") {
    // budget exhausted before the fixpoint: silent split labels would
    // poison downstream keep-lists, so the loop must fail loudly
    val path = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      TextDedup.connectedComponents(path, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("IVF: assignment picks max-cosine cell, probes rank cells, topK searches probed cells only") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid 0 (cell 0)
      (1L, Array(0.0f, 1.0f)),   // centroid 1 (cell 1)
      (2L, Array(0.9f, 0.1f)),   // → cell 0
      (3L, Array(0.1f, 0.9f)),   // → cell 1
      (4L, Array(0.7f, 0.7f)),   // equidistant → tie breaks to cell 0
      (5L, Array(2.0f, 0.0f))    // colinear with 0 → cell 0
    ).toDF("item", "emb")
    val n = VectorSearch.withNorm(vecs, col("item"), col("emb"))
    val cents = VectorSearch.ivfFit(n, nCells = 2)
    assert(cents.length == 2 && cents(0).toSeq == Seq(1.0, 0.0))
    val asg = VectorSearch.ivfAssign(n, cents)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    assert(asg == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 0))
    // query 5 probes cell 0 first (cos 1.0), cell 1 second
    val probes = VectorSearch.ivfProbes(n.where(col("id") === 5L), cents, nprobe = 2)
      .collect().map(_.getAs[Int]("pcell")).toSeq
    assert(probes == Seq(0, 1))
    // with nprobe=1, only cell-0 members are candidates
    val top = VectorSearch.ivfTopK(VectorSearch.ivfAssign(n, cents), cents,
      n.where(col("id") === 5L), k = 10, nprobe = 1)
      .collect().map(_.getAs[Long]("nid")).toSet
    assert(top == Set(0L, 2L, 4L), s"nprobe=1 must search one cell: $top")
  }

  test("ANN sizing rules: exact values at the scales the gauges run") {
    import graft.api.{VectorSearch => VS}
    // isqrt exactness at the clamp edges
    assert(VS.isqrt(0) == 0 && VS.isqrt(1) == 1 && VS.isqrt(63) == 7 && VS.isqrt(64) == 8)
    // cells: sqrt(N) clamped [8, 4096]
    assert(VS.ivfCellsFor(200) == 14)     // sf0.01 embeddings
    assert(VS.ivfCellsFor(2000) == 44)    // sf0.1
    assert(VS.ivfCellsFor(20000) == 141)  // sf1 decade gauge — past the old 128 clamp
    assert(VS.ivfCellsFor(20L * 1000 * 1000 * 1000) == 4096) // clamp
    // nprobe: max(ceil(sqrt(nCells)), ceil(nCells/8)), min 2 — the sqrt term
    // drives small models, the 1/8 scan floor binds past 64 cells
    assert(VS.nprobeFor(14) == 4)
    assert(VS.nprobeFor(44) == 7)
    assert(VS.nprobeFor(64) == 8)
    assert(VS.nprobeFor(141) == 18, "the 1/8 floor must bind at the decade gauge scale")
    assert(VS.nprobeFor(4096) == 512)
    // ADC refine shortlist: max(10k, pool/5) where pool = N*np/ncells —
    // the r16 rule replacing the fixed 400 (the third fixed-constant
    // cliff: 400 was 10% of the sf1 pool, ~1% one decade later)
    import graft.operators.{Similarity => Sim}
    assert(Sim.pqShortlistFor(200L * 4 / 14, 10) == 100)      // sf0.01: floor binds
    assert(Sim.pqShortlistFor(2000L * 7 / 44, 10) == 100)     // sf0.1: floor binds
    assert(Sim.pqShortlistFor(20000L * 18 / 141, 10) == 510,  // sf1 gauge
      "must cover at least the 400 entries that measured 8000 bp at sf1")
    assert(Sim.pqShortlistFor(200000L * 56 / 447, 10) == 5011) // next decade
  }

  test("IVF join gear (centroid table) assigns and probes identically to the expression gear") {
    // the above-reference-budget gear: same fitted model, same corpus —
    // broadcast-join argmax must agree with the reference-carrying
    // expression on every assignment and every probe list
    def vec(cluster: Int, id: Long): Array[Float] = {
      val v = Array.fill(8)(0.0f)
      v(cluster) = 1.0f
      for (j <- 0 until 8) v(j) += (0.05 * math.sin((id * 11 + j * 5).toDouble)).toFloat
      v
    }
    val rows = (0L until 120L).map(i => (i, vec((i % 5).toInt, i)))
    val n = VectorSearch.withNorm(rows.toDF("item", "emb"), col("item"), col("emb"))
      .withColumn("label", col("id") % 3) // a pass-through column must survive
      .persist()
    val cents = VectorSearch.ivfFitKMeans(n, nCells = 16, iters = 2)
    def asgMap(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    val exprAsg = asgMap(n.withColumn("cell",
      graft.functions.IvfExprs.ivf_argmax(col("v"), col("nrm"), cents)))
    val joinAsg = asgMap(VectorSearch.ivfAssignJoin(n, cents))
    assert(joinAsg == exprAsg, "join-gear assignment diverges from the expression gear")
    assert(VectorSearch.ivfAssignJoin(n, cents).columns.toSeq
      == n.columns.toSeq :+ "cell", "join gear must preserve corpus columns + cell")
    val q = n.where(col("id") < 20)
    def probeMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Int]] =
      df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("pcell"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exprProbes = probeMap(q.withColumn("pcell", org.apache.spark.sql.functions
      .explode(graft.functions.IvfExprs.ivf_top_cells(col("v"), col("nrm"), cents, 3))))
    val joinProbes = probeMap(VectorSearch.ivfProbesJoin(q, cents, nprobe = 3))
    assert(joinProbes == exprProbes, "join-gear probes diverge from the expression gear")
    n.unpersist()
  }

  test("IVF broadcast gear (model handle) assigns and probes identically to the expression gear") {
    // the above-budget DISPATCH gear: the same codegen'd argmax/top-cells
    // loop with the model behind a torrent-broadcast handle instead of an
    // in-plan reference array — assignments and probe lists must be
    // bit-identical to the expression gear on the same fitted model
    def vec(cluster: Int, id: Long): Array[Float] = {
      val v = Array.fill(8)(0.0f)
      v(cluster) = 1.0f
      for (j <- 0 until 8) v(j) += (0.05 * math.sin((id * 13 + j * 3).toDouble)).toFloat
      v
    }
    val rows = (0L until 120L).map(i => (i, vec((i % 5).toInt, i)))
    val n = VectorSearch.withNorm(rows.toDF("item", "emb"), col("item"), col("emb"))
      .withColumn("label", col("id") % 3)
      .persist()
    val cents = VectorSearch.ivfFitKMeans(n, nCells = 16, iters = 2)
    def asgMap(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    val exprAsg = asgMap(n.withColumn("cell",
      graft.functions.IvfExprs.ivf_argmax(col("v"), col("nrm"), cents)))
    val bcAsg = asgMap(VectorSearch.ivfAssignBc(n, cents))
    assert(bcAsg == exprAsg, "broadcast-gear assignment diverges from the expression gear")
    assert(VectorSearch.ivfAssignBc(n, cents).columns.toSeq
      == n.columns.toSeq :+ "cell", "broadcast gear must preserve corpus columns + cell")
    val q = n.where(col("id") < 20)
    def probeMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Int]] =
      df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("pcell"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exprProbes = probeMap(q.withColumn("pcell", org.apache.spark.sql.functions
      .explode(graft.functions.IvfExprs.ivf_top_cells(col("v"), col("nrm"), cents, 3))))
    val bcProbes = probeMap(VectorSearch.ivfProbesBc(q, cents, nprobe = 3))
    assert(bcProbes == exprProbes, "broadcast-gear probes diverge from the expression gear")
    n.unpersist()
  }

  test("IVF join gear preserves duplicate rows and map-typed pass-through columns") {
    // ADVICE r15: the old grouped-by-all-corpus-columns argmax silently
    // collapsed rows identical in EVERY column (shrinking the indexed
    // corpus and skewing cell means vs the expression gear, which keeps
    // duplicates) and failed outright on map-typed pass-through columns
    // (maps are not groupable). The surrogate-key argmax must keep
    // row-for-row cardinality on both.
    val rows = Seq.tabulate(12)(i => (i.toLong % 3, Array.fill(4)((i % 3 + 1).toFloat)))
    val n = VectorSearch.withNorm(rows.toDF("item", "emb"), col("item"), col("emb"))
      .withColumn("meta", map(lit("k"), col("id").cast("string")))
    val cents = Array(Array(1.0, 1.0, 1.0, 1.0), Array(-1.0, 1.0, -1.0, 1.0))
    val out = VectorSearch.ivfAssignJoin(n, cents).collect()
    assert(out.length == 12, "duplicate corpus rows must be preserved, not collapsed")
    assert(out.forall(r => r.getAs[Map[String, String]]("meta").nonEmpty))
    val probes = VectorSearch.ivfProbesJoin(n, cents, nprobe = 2).collect()
    assert(probes.length == 24, "each duplicate query row keeps its own probe list")
  }

  test("ivfFitKMeans: trained cells recover cluster structure first-N seeds miss") {
    // planted corpus: the 8 lowest ids — exactly what the first-N "fit"
    // takes as centroids — all sit in cluster 0, so the untrained
    // quantizer has every centroid inside one cluster and clusters 1-3
    // scatter across cells on noise alone; Lloyd rounds must pull the
    // centroids out to the actual cluster masses
    def vec(cluster: Int, id: Long): Array[Float] = {
      val v = Array.fill(8)(0.0f)
      v(cluster) = 1.0f
      for (j <- 0 until 8) v(j) += (0.05 * math.sin((id * 7 + j * 13).toDouble)).toFloat
      v
    }
    val rows = (0L until 8L).map(i => (i, vec(0, i))) ++
      (8L until 108L).map(i => (i, vec(1 + (i % 3).toInt, i)))
    val n = VectorSearch.withNorm(rows.toDF("item", "emb"), col("item"), col("emb")).persist()
    val queries = n.where(col("id") >= 8 && col("id") < 26) // spans clusters 1-3
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topSets(VectorSearch.topK(n, queries, k = 5))
    def recall(cents: Array[Array[Double]]): Double = {
      val got = topSets(
        VectorSearch.ivfTopK(VectorSearch.ivfAssign(n, cents), cents, queries, k = 5, nprobe = 1))
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    val seeded = recall(VectorSearch.ivfFit(n, nCells = 4))
    val trained = recall(VectorSearch.ivfFitKMeans(n, nCells = 4, iters = 4))
    n.unpersist()
    assert(trained > seeded, s"k-means must beat first-N seeds: $trained <= $seeded")
    assert(trained >= 0.9, s"trained recall@5 (nprobe=1) too low: $trained")
  }

  test("ivfFitKMeans: trained model independent of partitioning (decimal partials)") {
    // the oracle-replayability claim rests on every re-centroid mean being
    // partition-order independent; a float sum would make the fit drift
    // with the physical layout
    def vec(id: Long): Array[Float] =
      Array.tabulate(6)(j => (math.sin(id * 3 + j * 11) * 2).toFloat)
    val rows = (0L until 200L).map(i => (i, vec(i)))
    def fit(parts: Int): Seq[Seq[Double]] = {
      val n = VectorSearch.withNorm(
        rows.toDF("item", "emb").repartition(parts), col("item"), col("emb"))
      VectorSearch.ivfFitKMeans(n, nCells = 3, iters = 3).toSeq.map(_.toSeq)
    }
    assert(fit(1) == fit(7), "k-means fit must not depend on partition count")
  }

  test("Bpe.train matches the sequential reference; learned merges segment correctly") {
    import graft.api.Bpe
    // the worked-example corpus shape from the public BPE algorithm:
    // frequent suffixes (es, est) must win the early merges
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.train(df, col("text"), nMerges = 8)

    // sequential reference: same counting (all adjacent positions,
    // frequency-weighted), same lexicographic tie-break, same
    // left-to-right non-overlapping merge
    def mergeVec(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var words = corpus.groupBy(identity).map { case (w, ws) =>
      w.map(_.toString).toVector -> ws.size.toLong
    }
    val expected = List.newBuilder[(String, String, Long)]
    for (_ <- 0 until 8) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          stats((syms(i), syms(i + 1))) = stats.getOrElse((syms(i), syms(i + 1)), 0L) + c
          i += 1
        }
      }
      if (stats.nonEmpty) {
        val ((a, b), f) = stats.toSeq.minBy { case ((a, b), f) => (-f, a, b) }
        expected += ((a, b, f))
        words = words.toSeq.map { case (syms, c) => (mergeVec(syms, a, b), c) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    assert(merges.toList == expected.result(),
      s"distributed trainer diverged from the sequential algorithm: $merges")
    // es (9, ties st, lex wins) must be the first merge
    assert(merges.head._1 == "e" && merges.head._2 == "s" && merges.head._3 == 9L)
    // encoding an UNSEEN word with the learned merges: lossless and compressed
    val segs = Bpe.segment("lowest", merges.map(m => (m._1, m._2)))
    assert(segs.mkString == "lowest", s"segmentation lost characters: $segs")
    assert(segs.length < "lowest".length, s"learned merges failed to compress: $segs")
  }

  test("Bpe.encodeColumn: distributed encode ≡ sequential segment for every word") {
    import graft.api.Bpe
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.train(df, col("text"), nMerges = 8).map(m => (m._1, m._2))
    // encode seen AND unseen words through the column chain
    val words = (corpus.distinct ++ Seq("lowest", "newer", "wide", "a")).distinct
    val enc = words.toDF("w")
      .select(col("w"),
        filter(
          split(Bpe.encodeColumn(
            concat(lit("|"), array_join(split(col("w"), ""), "|"), lit("|")), merges),
            "\\|"),
          x => length(x) > 0).as("syms"))
      .collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Seq[String]]("syms").toList)
      .toMap
    words.foreach { w =>
      assert(enc(w) == Bpe.segment(w, merges).toList,
        s"column encode diverged from sequential segment on '$w': " +
          s"${enc(w)} vs ${Bpe.segment(w, merges)}")
      assert(enc(w).mkString == w, s"encode lost characters on '$w': ${enc(w)}")
    }
  }

  test("Sampling: deterministic decisions, per-stratum rates in binomial bounds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val rate = when(col("lang") === "en", 100).otherwise(500)
    def run() = graft.api.Sampling.stratified(df, rate, 1000, col("id"))
      .collect().map(_.getLong(0)).toSet
    val s1 = run()
    // replay-safety: the decision is a pure function of the key, so a
    // second evaluation (≈ a retried task) keeps exactly the same rows
    assert(s1 == run())
    val en = s1.count(_ % 2 == 0)
    val de = s1.count(_ % 2 != 0)
    assert(en > 50 && en < 200, s"en stratum at 10% of 1000 sampled $en")
    assert(de > 380 && de < 620, s"de stratum at 50% of 1000 sampled $de")
  }

  test("tfidf: corpus-wide words weigh zero, rare words weigh most") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "common rare common"), (2L, "common mid"), (3L, "common mid x")
    ).toDF("doc", "body")
    val out = graft.api.TextProfile.tfidf(docs, col("doc"), col("body"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(out((1L, "common")) == 0.0, "df == N must weigh ln(1) = 0")
    assert(out((1L, "rare")) > out((2L, "mid")), "df=1 must outweigh df=2")
    // Spark's log expression evaluates via StrictMath.log (can differ from
    // Math.log by 1 ulp); query outputs round to 4 dp, which absorbs it
    assert(out((1L, "rare")) == StrictMath.log(3.0), "tf=1 · ln(3/1)")
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

  test("ProductQuant: codes separate planted clusters; ADC recalls exact L2 neighbors") {
    import graft.api.ProductQuant
    // two tight clusters in 8 dims (2 subspaces × 4): PQ codes must give
    // same-cluster vectors identical codes, and ADC ranking must put a
    // query's own cluster ahead of the other one
    def vec(cluster: Int, id: Long): Array[Float] =
      Array.tabulate(8)(j => (cluster * 2.0 + 0.001 * ((id * 7 + j * 3) % 5)).toFloat)
    val rows = (0L until 40L).map(i => (i, vec((i % 2).toInt, i)))
    val n = VectorSearch.withNorm(rows.toDF("item", "emb"), col("item"), col("emb"))
    val books = ProductQuant.fit(n, m = 2, subDim = 4, k = 4, iters = 3)
    assert(books.length == 2 && books(0).length == 4 && books(0)(0).length == 4)

    val codes = ProductQuant.encode(n, books, subDim = 4)
      .groupBy("id").agg(sort_array(collect_list(struct(col("sub"), col("cell")))).as("c"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Any](1).toString).toMap
    // k=4 cells over 2 clusters: a cluster may own several cells, but no
    // code may be SHARED across clusters (cells are cluster-pure)
    val evenCodes = codes.filter(_._1 % 2 == 0).values.toSet
    val oddCodes = codes.filter(_._1 % 2 == 1).values.toSet
    assert(evenCodes.intersect(oddCodes).isEmpty,
      s"a PQ code crosses the planted clusters: even=$evenCodes odd=$oddCodes")

    val lutDf = ProductQuant.lut(n.where(col("id") < 2), books, subDim = 4)
    val top = ProductQuant.adcTopK(codes = ProductQuant.encode(n, books, subDim = 4),
        lutDf = lutDf, k = 10)
      .collect().groupBy(_.getAs[Long]("qid"))
    // every retrieved neighbor of query 0 (cluster 0) is even, of 1 odd
    top(0L).foreach(r => assert(r.getAs[Long]("nid") % 2 == 0, s"cross-cluster hit: $r"))
    top(1L).foreach(r => assert(r.getAs[Long]("nid") % 2 == 1, s"cross-cluster hit: $r"))
  }

  test("mixture: exact proportional quotas, no upsampling, partition-independent") {
    import graft.api.Sampling
    // strata: a=100 rows w=3, b=50 rows w=1 → K = min(33, 50) = 33 →
    // quotas a=99, b=33
    val rows = ((1L to 100L).map(i => (i, "a")) ++ (201L to 250L).map(i => (i, "b")))
      .toDF("id", "s")
    def run(parts: Int) = Sampling.mixture(
        rows.repartition(parts), col("id"), col("s"),
        when(col("s") === "a", 3).otherwise(1))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("stratum"))).toSet
    val kept = run(3)
    val byS = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byS == Map("a" -> 99, "b" -> 33), s"quotas off: $byS")
    assert(run(7) == kept, "mixture selection must not depend on partitioning")
  }

  test("mixture rejects non-positive and non-constant-per-stratum weights") {
    import graft.api.Sampling
    val rows = ((1L to 10L).map(i => (i, "a")) ++ (11L to 20L).map(i => (i, "b")))
      .toDF("id", "s")
    val nonConstant = intercept[Exception] {
      Sampling.mixture(rows, col("id"), col("s"),
        when(col("id") % 2 === 0, 2).otherwise(1)).collect()
    }
    assert(nonConstant.getMessage.contains("constant per stratum") ||
      Option(nonConstant.getCause).exists(_.getMessage.contains("constant per stratum")))
    intercept[Exception] {
      Sampling.mixture(rows, col("id"), col("s"),
        when(col("s") === "a", 0).otherwise(1)).collect()
    } // w=0: ANSI div-by-zero or the embedded guard — either way loud
  }

  test("IVF-PQ composition: every hit comes from a probed cell, scored by codes") {
    import graft.api.ProductQuant
    val n = VectorSearch.withNorm(
      Tables.embeddings(spark, sf()), col("vec_id"), col("embedding")).cache()
    val cents = VectorSearch.ivfFitKMeans(n, nCells = 4, iters = 2)
    val assigned = VectorSearch.ivfAssign(n, cents)
    val books = ProductQuant.fit(n, m = 4, subDim = 16, k = 8, iters = 2)
    val q = n.where(col("id") < 3)
    val probes = VectorSearch.ivfProbes(q, cents, nprobe = 2)
      .select(col("id").as("qid"), col("pcell"))
    val cand = assigned
      .join(broadcast(probes), col("cell") === col("pcell") && col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
    val hits = ProductQuant.adcTopKCandidates(
      ProductQuant.encode(n, books, 16), ProductQuant.lut(q, books, 16), cand, k = 5)
      .collect()
    assert(hits.nonEmpty)
    val cellOf = assigned.select("id", "cell").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    val probed = probes.collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Int]("pcell"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    hits.foreach { h =>
      val (qid, nid) = (h.getAs[Long]("qid"), h.getAs[Long]("nid"))
      assert(probed(qid).contains(cellOf(nid)),
        s"hit $nid for query $qid came from unprobed cell ${cellOf(nid)}")
    }
    n.unpersist()
  }

  test("ADC refine: final order is EXACT cosine; hits confined to the ADC shortlist") {
    import graft.api.ProductQuant
    import graft.functions.VectorExprs
    val n = VectorSearch.withNorm(
      Tables.embeddings(spark, sf()), col("vec_id"), col("embedding")).cache()
    // unit-sphere PQ (the shipped route): ADC squared-L2 ≡ 2-2cos ordering
    val nu = n.select(col("id"),
      transform(col("v"), x => x / col("nrm")).as("v"))
    val books = ProductQuant.fit(nu, m = 8, subDim = 8, k = 8, iters = 2)
    val codes = ProductQuant.encode(nu, books, 8)
    val q = n.where(col("id") < 3)
    val cand = n.select(col("id")).crossJoin(
        broadcast(q.select(col("id").as("qid"))))
      .where(col("id") =!= col("qid")).select("qid", "id")
    val lut = ProductQuant.lut(nu.where(col("id") < 3), books, 8)
    val refined = ProductQuant.adcRefineTopK(codes, lut, cand, n, k = 5, shortlist = 20)
      .collect()
    assert(refined.nonEmpty)
    // (a) within each query, ranks follow exact cosine DESC (ties nid ASC)
    refined.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rnk"))
      val cs = byRank.map(r => (r.getAs[Double]("cos"), r.getAs[Long]("nid")))
      // display cos is rounded to 4dp while ranking uses the unrounded
      // value, so only non-increasing rounded cos is assertable here
      cs.sliding(2).foreach { case Array((c1, n1), (c2, n2)) =>
        assert(c1 >= c2,
          s"refined order not exact-cosine: ($c1,$n1) before ($c2,$n2)")
      case _ => ()
      }
    }
    // (b) every hit is in the ADC top-20 shortlist for its query
    val adc = ProductQuant.adcTopKCandidates(codes, lut, cand, k = 20).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    refined.foreach { r =>
      assert(adc.contains((r.getAs[Long]("qid"), r.getAs[Long]("nid"))),
        s"refined hit outside the ADC shortlist: $r")
    }
    n.unpersist()
  }
}
