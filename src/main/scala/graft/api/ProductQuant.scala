package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest neighbor at memory
  * scale: vectors compress to `m` one-byte codes (one per subspace), and
  * query distance is approximated by table lookup (ADC — asymmetric
  * distance computation) instead of touching the raw floats.
  *
  * Why this is the 100 TB ANN path beyond IVF: IVF prunes WHICH vectors a
  * query scores, but each candidate still costs a full-dimension scan of
  * the raw corpus. PQ shrinks the thing being scanned — a 64-dim float
  * vector (256 B) becomes `m` codes (4 B here), so the scored
  * representation of a 10⁹-vector corpus fits in cluster memory, and the
  * per-candidate cost is `m` additions. Production systems (FAISS
  * IVF-PQ) compose both; here each is its own oracle-gated operator.
  *
  * Determinism contract: every distance is computed in DECIMAL —
  * components cast to DECIMAL(12,6), squared diffs exact at scale 12,
  * sums exact — so assignment, codes, and ADC scores carry no float
  * accumulation anywhere and the DuckDB oracle replays the whole thing
  * (fit included) bit-for-bit. Centroid means round to 4 dp like
  * [[VectorSearch.ivfFitKMeans]]; `+ 0.0` canonicalizes IEEE −0.0.
  *
  * Scale shape: fit moves only the model (m × k × subDim doubles per
  * round) to the driver; assignment/encoding are narrow projections
  * against literal centroids (no exchange); ADC is an explode to
  * (id, sub, code) — 4 short rows per vector, never the raw vector —
  * joined broadcast to the 160-entry LUT and re-summed map-side.
  */
object ProductQuant {

  /** Trained codebooks: cents(sub)(cell)(dim), each a 4 dp double. */
  type Codebooks = Array[Array[Array[Double]]]

  /** [[codebookCellsFor]] clamps — also interpolated into the SQL
    * oracles' sizing CTEs; keep the rule here the ONLY copy. */
  val CodebookCellsMin = 8
  val CodebookCellsMax = 256

  /** Scale-adaptive codebook size: k ≈ √N cells per subspace, clamped to
    * [[[CodebookCellsMin]], [[CodebookCellsMax]]]. Why adaptive: the r13
    * measured decade showed FIXED 8-cell codebooks collapsing
    * (cross-family recall 28% → 4% at 10× data) — quantization error per
    * subspace grows with corpus spread unless the codebook grows with it.
    * 256 is the classic one-byte-code ceiling (FAISS PQx8): past it each
    * code no longer fits a byte and ADC LUTs stop being L1-resident, so
    * production systems widen `m` instead. */
  def codebookCellsFor(n: Long): Int =
    math.max(CodebookCellsMin.toLong,
      math.min(CodebookCellsMax.toLong, VectorSearch.isqrt(n))).toInt

  /** Exact-decimal squared L2 distance between v's subspace `sub` slice
    * and a centroid — [[graft.functions.PqDist2]] carries the centroid as
    * a reference array (NOT literals), so the generated class is shared
    * across Lloyd rounds instead of recompiling per round. */
  private def dist2(v: Column, sub: Int, subDim: Int, cent: Array[Double]): Column =
    graft.functions.PqExprs.pq_dist2(v, cent, sub * subDim)

  /** Argmin cell for one subspace (ties → lowest cell id): one codegen'd
    * narrow projection, centroids by reference. */
  private def assign(v: Column, sub: Int, subDim: Int, cents: Array[Array[Double]]): Column =
    graft.functions.PqExprs.pq_argmin(v, cents, sub * subDim)

  /** Lloyd fit of `m` independent k-means codebooks on the subspace
    * slices. Seeds: the `k` lowest-id vectors' slices (deterministic).
    * Empty cells keep their previous centroid. */
  def fit(corpus: DataFrame, m: Int, subDim: Int, k: Int, iters: Int = 2): Codebooks = {
    require(m >= 1 && subDim >= 1 && k >= 2 && iters >= 1, "bad PQ params")
    val seedRows = corpus.orderBy("id").select("v").limit(k).collect()
      .map(_.getSeq[Double](0).toArray)
    // a corpus smaller than k (empty partition, first ingest) fits the
    // codebook it can support: one cell per available vector — k codes
    // can't carry more information than n distinct points anyway. An
    // empty corpus yields empty codebooks; encode/lut stay well-formed.
    val kEff = math.min(k, seedRows.length)
    var books: Codebooks =
      Array.tabulate(m, kEff)((s, c) => seedRows(c).slice(s * subDim, (s + 1) * subDim))
    for (_ <- 0 until iters) {
      // all m assignments ride ONE corpus pass; the explode shuffles
      // (sub, cell, dim)-keyed decimal partials, map-side combined
      val withCells = corpus.select(
        books.indices.map(s => assign(col("v"), s, subDim, books(s)).as(s"c$s")) :+ col("v"): _*)
      val means = withCells
        .select(col("*"), posexplode(col("v")).as(Seq("d0", "x")))
        .select(
          expr(s"d0 div $subDim").cast("int").as("sub"),
          element_at(array(books.indices.map(s => col(s"c$s")): _*),
            expr(s"d0 div $subDim").cast("int") + 1).as("cell"),
          expr(s"d0 % $subDim").cast("int").as("dim"),
          col("x"))
        .groupBy("sub", "cell", "dim")
        .agg((round(sum(col("x").cast("decimal(18,6)")).cast("double") / count(lit(1)), 4) + 0.0).as("c"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach(r => next(r.getAs[Int]("sub"))(r.getAs[Int]("cell"))(r.getAs[Int]("dim")) =
        r.getAs[Double]("c"))
      books = next
    }
    books
  }

  /** Encode: (id, sub, cell) — the compressed corpus, 4 rows per vector,
    * raw floats left behind. */
  def encode(corpus: DataFrame, books: Codebooks, subDim: Int): DataFrame =
    corpus.select(col("id"),
      posexplode(array(books.indices.map(s =>
        assign(col("v"), s, subDim, books(s)).cast("int")): _*)).as(Seq("sub", "cell")))

  /** ADC lookup table: (qid, sub, cell, d2) — m × k exact-decimal entries
    * per query, computed from the query's raw slices by ONE
    * reference-carrying expression ([[graft.functions.PqLut]]): plan size
    * and generated-class count stay O(1) as the scale-adaptive codebook
    * grows (the literal m×k struct array recompiled a ~350-entry class
    * per plan at sf0.1 — measured as the dominant cost of the PQ family
    * after the √N sizing landed). */
  def lut(queries: DataFrame, books: Codebooks, subDim: Int): DataFrame = {
    if (books.forall(_.isEmpty)) // empty-corpus fit: no codes ⇒ empty LUT,
      return queries.select(col("id").as("qid"), // same schema (d2 typed
        lit(0).as("sub"), lit(0).as("cell"),     // via a zero centroid)
        dist2(col("v"), 0, subDim, Array.fill(subDim)(0.0)).as("d2"))
        .where(lit(false))
    queries.select(col("id").as("qid"),
      explode(graft.functions.PqExprs.pq_lut(col("v"), books, subDim)).as("e"))
      .select(col("qid"), col("e.sub"), col("e.cell"), col("e.d2"))
  }

  /** PQ-ADC top-k: approximate distances by code lookup, bounded-heap
    * top-k per query (ascending distance, ties → lowest id). */
  def adcTopK(codes: DataFrame, lutDf: DataFrame, k: Int): DataFrame = {
    val scored = codes.join(broadcast(lutDf), Seq("sub", "cell"))
      .filter(col("id") =!= col("qid"))
      .groupBy("qid", "id")
      .agg(sum(col("d2")).as("d2"))
    rank(scored, k)
  }

  /** ADC restricted to a candidate set (qid, id) — the IVF-PQ composition:
    * IVF decides WHICH vectors a query scores, PQ decides how cheaply.
    * The candidate join keys on id; the LUT join is (qid, sub, cell)
    * broadcast; distances stay exact-decimal. */
  def adcTopKCandidates(codes: DataFrame, lutDf: DataFrame,
      cand: DataFrame, k: Int): DataFrame = {
    val scored = cand.join(codes, "id")
      .join(broadcast(lutDf), Seq("qid", "sub", "cell"))
      .groupBy("qid", "id")
      .agg(sum(col("d2")).as("d2"))
    rank(scored, k)
  }

  /** IVF-PQ with EXACT re-rank refinement — the production retrieval
    * shape (FAISS `refine`): the 8 B/vector ADC scan ranks the probed
    * candidates, the top-`shortlist` per query are re-scored by exact
    * cosine against the raw vectors, and the final top-k is exact-cosine
    * ordered. Compression decides WHAT gets exact-scored (k·C rows per
    * query — model-sized), never the final order, so near-tie corpora
    * stop costing recall: quantization error only matters if it pushes a
    * true neighbor out of the C-deep shortlist. `corpus` is the normed
    * (id, v, nrm) frame; queries are its `qid` rows (broadcast — the
    * corpus never shuffles). */
  def adcRefineTopK(codes: DataFrame, lutDf: DataFrame, cand: DataFrame,
      corpus: DataFrame, k: Int, shortlist: Int): DataFrame = {
    val adc = cand.join(codes, "id")
      .join(broadcast(lutDf), Seq("qid", "sub", "cell"))
      .groupBy("qid", "id")
      .agg(sum(col("d2")).as("d2"))
    val short = adc.groupBy("qid")
      .agg(graft.functions.TopKAgg.top_k_agg(
        (-col("d2")).cast("double"), col("id"), shortlist).as("tk"))
      .select(col("qid"), explode(col("tk")).as("x"))
      .select(col("qid"), col("x.id").as("nid"))
    val qs = corpus.join(broadcast(short.select("qid").distinct()),
        col("id") === col("qid"))
      .select(col("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val cos = graft.functions.VectorExprs.dot_product(col("qv"), col("nv")) /
      (col("qn") * col("nn"))
    val scored = corpus.select(col("id").as("nid"), col("v").as("nv"), col("nrm").as("nn"))
      .join(broadcast(short), "nid")
      .join(broadcast(qs), "qid")
      .select(col("qid"), col("nid"), cos.as("cos"))
    scored.groupBy("qid")
      .agg(graft.functions.TopKAgg.top_k_agg(col("cos"), col("nid"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("qid"), col("x.id").as("nid"),
        (col("pos") + 1).cast("int").as("rnk"),
        round(col("x.score"), 4).as("cos"))
  }

  /** Bounded-heap finalization shared by both search shapes: heap wants
    * DESC score, so the (exact) distance is negated for ranking only. */
  private def rank(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(graft.functions.TopKAgg.top_k_agg(
        (-col("d2")).cast("double"), col("id"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("qid"), col("x.id").as("nid"),
        (col("pos") + 1).cast("int").as("rnk"),
        (round(-col("x.score"), 4) + 0.0).as("dist2"))
}
