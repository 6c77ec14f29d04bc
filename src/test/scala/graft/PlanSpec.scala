package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan shape assertions: the 100 TB contract. Each declared
  * operator must compile to the plan we'd want on a 1000-executor cluster —
  * filters pushed into the parquet scan, dimension joins broadcast, top-k
  * as TakeOrderedAndProject (no global sort), codegen'd hot paths. */
class PlanSpec extends SparkSpec {

  /** Final physical plan — executed first so AQE resolves to the real
    * (isFinalPlan=true) plan with codegen spans inserted. */
  private def planString(df: DataFrame): String = {
    df.collect() // AQE: same QueryExecution must run so the plan finalizes
    df.queryExecution.executedPlan.toString()
  }

  test("scan: filter + projection pushed down to parquet") {
    val p = planString(Relational.qScanLineitem.fn(spark, sf()))
    assert(p.contains("PushedFilters:") &&
      p.contains("IsNotNull(l_shipdate)"), s"no pushed filters in:\n$p")
    // pruned read schema: only the 7 referenced columns, not all 11
    assert(p.contains("l_extendedprice") && !p.contains("l_returnflag"),
      "column pruning failed — scan reads unreferenced columns")
  }

  test("dim join compiles to broadcast hash join, no fact shuffle") {
    val p = planString(Relational.qJoinBroadcast.fn(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = planString(Relational.qTopk.fn(spark, sf()))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("semi/anti route as join strategies, not subquery re-scans") {
    val ps = planString(Relational.qJoinSemi.fn(spark, sf()))
    val pa = planString(Relational.qJoinAnti.fn(spark, sf()))
    assert(ps.contains("LeftSemi"), s"semi join missing:\n$ps")
    assert(pa.contains("LeftAnti"), s"anti join missing:\n$pa")
  }

  test("null-safe join plans as a hash join, not nested-loop") {
    val p = planString(Relational.qJoinNullsafe.fn(spark, sf()))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"null-safe equality lost its equi-join plan:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"null-safe join degenerated to a product:\n$p")
  }

  test("agg queries keep partial (map-side) aggregation") {
    val p = planString(Relational.qAggDelay.fn(spark, sf()))
    // two HashAggregate nodes: partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("codec hot path stays in whole-stage codegen spans") {
    val df = CodecQueries.qParseRouteDelay.fn(spark, sf())
    val p = planString(df)
    // '*(n)' prefixes mark WholeStageCodegen spans in the plan tree; the
    // scan→parse→filter→partial-agg pipeline must be inside one
    assert("""\*\(\d+\)""".r.findAllIn(p).size >= 2, s"hot path not codegen'd:\n$p")
    assert("""\*\(\d+\) HashAggregate""".r.findAllIn(p).nonEmpty,
      s"partial agg outside codegen:\n$p")
  }

  test("similarity brute-force broadcasts the query side") {
    val p = planString(Similarity.qSimTopk.fn(spark, sf()))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    // label rides the normed projection: corpus side is ONE scan of
    // embeddings, not a scan + id-self-join to re-attach label
    // (AQE prints Final + Initial plans; count the final section only)
    val finalPlan = p.split("== Initial Plan ==").head
    val scans = """Scan parquet""".r.findAllIn(finalPlan).length
    assert(scans == 2, s"expect 2 embeddings scans (corpus + broadcast queries), got $scans:\n$p")
  }

  test("span dedup: CDC chunking is map-only, only digests shuffle") {
    val p = planString(Curation_.qSpanDedup.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // countDistinct plans as the standard two-phase distinct aggregate:
    // exchange on (dig, id) then on dig. Both keys lead with the 16-byte
    // digest; chunk derivation (token hash + boundary filter + slice) is
    // map-only and neither text nor chunk ever rides a partitioning key.
    val exchanges = """Exchange hashpartitioning\([^)]*\)""".r.findAllIn(finalPlan).toList
    assert(exchanges.length == 2,
      s"span dedup must shuffle exactly twice (distinct-agg phases), got ${exchanges.length}:\n$p")
    assert(exchanges.forall(_.contains("hashpartitioning(dig")),
      s"every span-dedup exchange must be digest-keyed:\n$p")
    assert(!"""hashpartitioning\([^)]*(text|chunk#)""".r.findFirstIn(finalPlan).isDefined,
      s"document text/chunk must never ride a shuffle key:\n$p")
    assert(finalPlan.contains("partial"),
      s"no map-side combine before the digest exchange:\n$p")
  }

  test("tpch q7: nation-pair disjunction prunes both broadcast build sides") {
    val p = planString(Tpch.qTpchQ7.fn(spark, sf()))
    // The symmetric (n1,n2) pair disjunction implies n_name IN
    // ('NATION_1','NATION_2') on EACH side. At 100 TB the difference is
    // joining the 2-year lineitem window against 2/25 of each nation dim
    // vs all of it — the IN conjunct must reach both nation scans.
    val natScans = p.linesIterator.filter(l =>
      l.contains("FileScan parquet") && l.contains("nation.parquet")).toList
    assert(natScans.length == 2, s"expected 2 nation scans, got ${natScans.length}:\n$p")
    // Catalyst's CNF conversion derives it as Or(EqualTo(..)) — same prune.
    natScans.foreach { l =>
      assert(l.contains("In(n_name") || l.contains("Or(EqualTo(n_name"),
        s"nation scan lacks pushed n_name prefilter:\n$l\n$p")
    }
  }

  test("bm25: no token shuffle — single-partition stats agg + 1-row attach only") {
    val p = planString(TextAnalysis.qBm25Search.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // per-doc tf/dl are array HOFs on the scan; the only exchange is the
    // 1-row corpus-stats global aggregate. No hashpartitioning anywhere —
    // nothing keyed ever shuffles, there is no explode of the token stream.
    assert(!finalPlan.contains("Exchange hashpartitioning"),
      s"bm25 must not hash-shuffle anything:\n$p")
    assert(!finalPlan.contains("Generate explode"),
      s"bm25 must not explode the token stream:\n$p")
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"bm25 top-20 must compile to TakeOrderedAndProject:\n$p")
  }

  test("inverted index: one term-keyed exchange, heap-bounded partials") {
    val p = planString(TextAnalysis.qInvertedIndex.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // per-doc term dedup is map-side (array_distinct before explode); the
    // single data exchange is keyed by the term, with partial TopKAgg
    // heaps bounding what any map partition ships for a hot term
    val dataExchanges = """Exchange hashpartitioning\(word""".r.findAllIn(finalPlan).length
    assert(dataExchanges == 1 &&
      "Exchange hashpartitioning".r.findAllIn(finalPlan).length == 1,
      s"inverted index must shuffle once, keyed by term:\n$p")
    assert(finalPlan.contains("partial_top_k_agg") ||
      """partial_.*top_k""".r.findFirstIn(finalPlan).isDefined ||
      finalPlan.contains("partial"),
      s"no map-side partial aggregation before the term exchange:\n$p")
  }

  test("hybrid fusion: rank windows see <=50-row legs, never the corpus") {
    val p = planString(Similarity.qHybridSearch.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // both legs bound to top-50 before any Window: the keyword leg via
    // TakeOrderedAndProject, the vector leg via the bounded-heap TopKAgg —
    // a Sort over the full corpus would appear as a global Sort above a
    // scan-sized frame; the only sorts allowed sit above the tiny legs.
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"keyword leg must reduce via TakeOrderedAndProject:\n$p")
    assert(finalPlan.contains("top_k_agg") || finalPlan.contains("TopKAgg"),
      s"vector leg must reduce via the bounded-heap aggregate:\n$p")
  }

  test("exact dedup shuffles the 16-byte digest, not document text") {
    val p = planString(Dedup.qDedupExact.fn(spark, sf()))
    assert("""hashpartitioning\(__digest""".r.findAllIn(p).nonEmpty,
      s"dedup exchange key is not the digest:\n$p")
    assert("""hashpartitioning\([^)]*text""".r.findAllIn(p).isEmpty,
      s"dedup exchange keyed on raw text:\n$p")
    // map-side combine happens before the digest exchange
    assert(p.contains("partial_min"), s"no partial aggregation before exchange:\n$p")
  }

  test("sign-LSH signature is one narrow projection: no exchange, no join") {
    import org.apache.spark.sql.functions._
    val n = graft.api.VectorSearch.withNorm(
      Tables.embeddings(spark, sf()), col("vec_id"), col("embedding"))
    val p = planString(graft.api.VectorSearch.signLsh(n, nPlanes = 8, dim = 64))
    assert(!p.contains("Exchange"), s"signature projection shuffles the corpus:\n$p")
    assert(!p.contains("Join"), s"signature computed via a join:\n$p")
  }

  test("top-k reduces scored rows before the per-qid exchange, no window") {
    import org.apache.spark.sql.functions._
    val n = graft.api.VectorSearch.withNorm(
      Tables.embeddings(spark, sf()), col("vec_id"), col("embedding"))
    val p = planString(graft.api.VectorSearch.topK(n, n.where(col("id") < 3), k = 5))
    // bounded-heap aggregate: partial (map-side) + final ObjectHashAggregate
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"no two-phase top-k aggregation:\n$p")
    assert(!p.contains("Window"), s"top-k still uses a per-qid window:\n$p")
  }

  test("IVF assignment is a narrow projection: no exchange, no join") {
    import org.apache.spark.sql.functions._
    val n = graft.api.VectorSearch.withNorm(
      Tables.embeddings(spark, sf()), col("vec_id"), col("embedding"))
    val cents = graft.api.VectorSearch.ivfFit(n, nCells = 4)
    val p = planString(graft.api.VectorSearch.ivfAssign(n, cents))
    assert(!p.contains("Exchange"), s"IVF assignment shuffles the corpus:\n$p")
    assert(!p.contains("Join"), s"IVF assignment computed via a join:\n$p")
    // probing is equally narrow on the query side
    val pp = planString(graft.api.VectorSearch.ivfProbes(
      n.where(col("id") < 3), cents, nprobe = 2))
    assert(!pp.contains("Exchange") && !pp.contains("Join"),
      s"IVF probe projection not narrow:\n$pp")
  }

  test("k-means re-centroid shuffles only map-side-combined (cell, dim) partials") {
    import org.apache.spark.sql.functions._
    val n = graft.api.VectorSearch.withNorm(
      Tables.embeddings(spark, sf()), col("vec_id"), col("embedding"))
    val cents = graft.api.VectorSearch.ivfFit(n, nCells = 4)
    val p = planString(
      graft.api.VectorSearch.ivfAssign(n, cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum(col("x").cast("decimal(18,6)")).as("s")))
    // two-phase hash aggregate: partial BEFORE the exchange (the shuffle
    // carries <= nCells x dim rows per partition, never the exploded stream)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"re-centroid aggregation not two-phase:\n$p")
    assert(p.indexOf("HashAggregate") < p.indexOf("Exchange"),
      s"no map-side combine before the re-centroid exchange:\n$p")
  }

  test("subword token counting is one narrow projection: no exchange, no explode") {
    import org.apache.spark.sql.functions._
    val w = split(col("text"), " ")
    val p = planString(
      Tables.documents(spark, sf())
        .select(col("doc_id"),
          aggregate(
            transform(w, x => graft.functions.SubwordCount.subword_count(x).cast("long")),
            lit(0L), (acc, x) => acc + x).as("n_subword_tokens")))
    assert(!p.contains("Exchange"), s"token counting shuffles:\n$p")
    assert(!p.contains("Generate"), s"token counting explodes the token stream:\n$p")
  }

  test("correlated subqueries decorrelate to hash joins, never per-row re-scans") {
    val p = planString(
      graft.operators.SqlSurface.qSubqueryCorrelated.fn(spark, sf()))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated predicate planned as a nested loop:\n$p")
    // EXISTS / NOT EXISTS become (anti)semi hash joins; the scalar
    // subquery becomes an aggregate joined on the correlation key
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"EXISTS/NOT EXISTS not planned as semi/anti joins:\n$p")
  }

  test("rank-limit filters get WindowGroupLimit pushdown (no full window materialization)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // row_number() <= k is the window-top-k idiom; Catalyst's
    // InferWindowGroupLimit inserts a per-partition group limit BEFORE the
    // window sort, so each group materializes k rows, not all rows — the
    // built-in optimization that makes a custom top-k rewrite rule
    // unnecessary for the window formulation (TopKAgg still wins when the
    // output is an aggregate, PlanSpec above)
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)
    val df = Tables.orders(spark, sf())
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
    val p = planString(df)
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pushed into a group limit:\n$p")
  }

  test("stratified sample is one scan, no join — the decision is a pushed predicate") {
    val p = planString(Analytic.qSampleStratified.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Join"), s"sampling must not join a seed table:\n$p")
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1,
      s"sampling must read lineitem exactly once:\n$p")
  }

  test("pivot is one aggregation pass with map-side partials (no per-value scans)") {
    val p = planString(Analytic.qPivot.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1,
      s"pivot must read orders exactly once:\n$p")
    assert("HashAggregate".r.findAllIn(finalPlan).size >= 2,
      s"pivot lost partial aggregation:\n$p")
  }

  test("profiler reads the table once per statistic family, distincts stay narrow") {
    val p = planString(operators.Profiling.qProfile.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // pass 1 = nulls/min/max aggregate, pass 2 = (gid, value) distinct —
    // NOT one scan per column, and NOT the Expand×7 multi-distinct (which
    // evaluated all 23 aggregates per expanded copy; 7.9s vs ~1s at sf0.1)
    assert("Scan parquet".r.findAllIn(finalPlan).length == 2,
      s"profile must be exactly two passes over lineitem:\n$p")
    assert(!finalPlan.contains("Expand"),
      s"distincts should be the narrow two-level aggregate, not Expand:\n$p")
    assert(finalPlan.contains("Generate"),
      s"expected the exploded (gid, value) distinct path:\n$p")
  }

  test("corr moments shuffle 6 partials per group, single scan") {
    val p = planString(Analytic.qCorrStats.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1,
      s"moment collection must read lineitem once:\n$p")
    assert(finalPlan.contains("partial_sum") || finalPlan.contains("partial"),
      s"moments not map-side combined:\n$p")
  }

  test("bucketed tables sort-merge join with no exchange (co-located join)") {
    import org.apache.spark.sql.functions._
    // the 100 TB co-location story: both fact tables bucketed on the join
    // key at write time -> the recurring join runs with ZERO shuffles
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    Tables.orders(spark, sf()).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf()).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"))
      val p = planString(j)
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!"""Exchange""".r.findAllIn(p.split("== Initial Plan ==").head).hasNext,
        s"bucketed join still shuffles:\n$p")
      assert(j.count() ==
        Tables.lineitem(spark, sf()).join(Tables.orders(spark, sf()),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned write + partition pruning: non-matching partitions never read") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    Tables.events(spark, sf())
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    // no aggregate: keep the plan exchange-free so the scan is a direct
    // leaf (AQE would wrap it in a query stage behind a shuffle)
    val df = spark.read.parquet(dir)
      .where(col("day") === "2024-01-05")
      .select("event_id", "event_type", "day")
    val p = planString(df)
    // the filter lands in PartitionFilters (directory-level pruning), so
    // the scan touches only the one matching partition's files
    assert("""PartitionFilters: \[[^\]]*day[^\]]*2024-01-05""".r.findAllIn(p).nonEmpty,
      s"day filter not applied at partition level:\n$p")
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scanned = finalPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected exactly 1 partition scanned, got $scanned")
  }

  test("dynamic partition pruning: runtime dim filter prunes the partitioned fact scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the 100 TB star-schema idiom: the fact table is partitioned on a
    // dim-joined column, and the dim's SELECTIVE filter is only known at
    // runtime — DPP turns the broadcast build side into a partition-filter
    // subquery, so the fact scan lists only the surviving directories
    val base = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val dir = s"$base/orders"
    graft.api.Layout.writePartitioned(
      Tables.orders(spark, sf()).withColumn("prio", col("o_orderpriority")),
      dir, "prio")
    // the dim must be a file-source scan with a real runtime filter — an
    // in-memory LocalRelation constant-folds the filter away and the
    // pruning rule sees no selective predicate to subquery on
    Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"),
      ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop")).toDF("d_prio", "d_tag")
      .write.mode("overwrite").parquet(s"$base/dim")
    val fact = spark.read.parquet(dir)
    val dim = spark.read.parquet(s"$base/dim")
    val joined = fact
      .join(broadcast(dim.filter(col("d_tag") === "keep")),
        col("prio") === col("d_prio"))
      .agg(count(lit(1)).as("n"))
    val p = planString(joined)
    assert(p.contains("dynamicpruningexpression"),
      s"fact scan carries no runtime partition-pruning subquery:\n$p")
    // and the pruned read is still correct
    val expected = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(joined.head().getLong(0) == expected)
  }

  test("dot_product expression is codegen-capable (no fallback)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(graft.functions.VectorExprs.dot_product(col("a"), col("b")).as("d"))
    assert(df.head().getDouble(0) == 11.0)
    // interpreted and codegen paths agree
    val codegenOff = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(df.head().getDouble(0) == 11.0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", codegenOff)
  }

  test("tpch q5: snowflake dims broadcast, fact joins stay hash/merge, date filter pushed") {
    val p = planString(Tpch.qTpchQ5.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).nonEmpty,
      s"nation/region/supplier should broadcast:\n$p")
    assert(!finalPlan.contains("CartesianProduct") && !finalPlan.contains("NestedLoop"),
      s"snowflake degenerated to a product:\n$p")
    assert(finalPlan.contains("PushedFilters"), s"no pushdown at all:\n$p")
    assert(finalPlan.contains("o_orderdate"), s"date predicate lost:\n$p")
  }

  test("scd2: both window passes share one hash exchange on custkey") {
    import org.apache.spark.sql.functions.col
    val p = planString(Maintenance.qScd2.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(hashEx == 1,
      s"lag + lead partition identically; expected ONE hash exchange, got $hashEx:\n$p")
  }

  test("anomaly: one window pass, one shuffle, no joins") {
    val p = planString(Sequence.qAnomaly.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Window \\[".r.findAllIn(finalPlan).length == 1,
      s"rolling stats must ride a single Window node:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length == 1,
      s"anomaly must shuffle once on user_id:\n$p")
    assert(!finalPlan.contains("Join"), s"anomaly needs no join:\n$p")
  }

  test("funnel: no cartesian/nested-loop; steps pre-aggregate before joining") {
    val p = planString(Sequence.qFunnel.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("NestedLoop") && !finalPlan.contains("Cartesian"),
      s"funnel fell back to a quadratic join:\n$p")
    // conditional-min per step: partial aggregation runs before each join
    assert(finalPlan.contains("partial_min") || finalPlan.contains("partial"),
      s"step minima not map-side combined:\n$p")
  }

  test("dq audit: scalar checks share one scan per table, anti-joins add their own") {
    val p = planString(Maintenance.qDqChecks.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // 6 scans: orders scalars (pk-dup + null-rate fused) 1, lineitem
    // domain 1, lineitem→orders anti 2, orders→customer anti 2
    val scans = "Scan parquet".r.findAllIn(finalPlan).length
    assert(scans == 6, s"expected 6 scans (fused scalar checks), got $scans:\n$p")
  }

  test("incr_agg: partials map-side combined in both slices") {
    val p = planString(Maintenance.qIncrAgg.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("partial_sum") || finalPlan.contains("partial"),
      s"partial aggregation missing:\n$p")
  }

  test("grouped top-k: heap aggregate replaces the window sort") {
    val p = planString(Analytic.qGroupedTopk.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("top_k_agg"), s"TopKAgg missing:\n$p")
    assert(!finalPlan.contains("RunningWindowFunction") &&
      !finalPlan.contains("row_number"),
      s"grouped top-k must not fall back to a window sort:\n$p")
  }

  test("TPC-H Q6: all three predicates pushed to the scan, projection pruned") {
    val p = planString(Tpch.qTpchQ6.fn(spark, sf()))
    // the rendered PushedFilters list truncates, so pin the visible
    // prefix plus the pruned read schema (exactly the 4 referenced cols)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)"),
      s"Q6 predicates not pushed:\n$p")
    assert(p.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"),
      s"Q6 scan projection not pruned to 4 columns:\n$p")
  }

  test("TPC-H Q4/Q13: EXISTS is a semi join; outer distribution keeps its hash join") {
    val p4 = planString(Tpch.qTpchQ4.fn(spark, sf()))
    val f4 = p4.split("== Initial Plan ==").head
    // the EXISTS must test membership once per order (LeftSemi), never
    // materialize a distinct qualifying-key set and re-join it
    assert(f4.contains("LeftSemi"), s"Q4 EXISTS not a semi join:\n$p4")
    assert("Scan parquet".r.findAllIn(f4).length == 2,
      s"Q4 must scan orders + lineitem exactly once each:\n$p4")
    assert(!f4.contains("NestedLoop") && !f4.contains("Cartesian"),
      s"Q4 EXISTS degenerated to a product:\n$p4")
    val p13 = planString(Tpch.qTpchQ13.fn(spark, sf()))
    val f13 = p13.split("== Initial Plan ==").head
    // zero-order customers ride the NULL-extended outer rows; the join
    // must stay hash-based with the priority predicate on the orders input
    assert(f13.contains("LeftOuter"), s"Q13 lost its outer join:\n$p13")
    assert(f13.contains("HashJoin") || f13.contains("SortMergeJoin"),
      s"Q13 outer join not hash-based:\n$p13")
    assert(!f13.contains("NestedLoop") && !f13.contains("Cartesian"),
      s"Q13 outer join degenerated to a product:\n$p13")
  }

  test("TPC-H Q21/Q17: quantifiers and scalar avg decorrelate to hash joins") {
    // NB: asserted on the full plan (Final + Initial sections): the tiny
    // test SF yields zero qualifying rows, so AQE's empty-relation
    // propagation erases the final plan's join tree — the Initial section
    // still shows the compiled shape
    val p21 = planString(Tpch.qTpchQ21.fn(spark, sf()))
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"Q21 EXISTS/NOT EXISTS not semi/anti joins:\n$p21")
    assert(!p21.contains("NestedLoop") && !p21.contains("Cartesian"),
      s"Q21 quantifier chain degenerated to a product:\n$p21")
    val p17 = planString(Tpch.qTpchQ17.fn(spark, sf()))
    val f17 = p17.split("== Initial Plan ==").head
    // the per-part average is ONE aggregate broadcast back, not a re-scan
    assert(f17.contains("BroadcastHashJoin"),
      s"Q17 per-part averages must broadcast:\n$p17")
    assert(!f17.contains("NestedLoop") && !f17.contains("Cartesian"),
      s"Q17 correlation planned as a nested loop:\n$p17")
  }

  test("TPC-H Q7: nation build sides pruned to the two named nations") {
    val p = planString(Tpch.qTpchQ7.fn(spark, sf()))
    // the symmetric pair disjunction must reach BOTH nation scans as a
    // per-side n_name predicate (derived or explicit): at 100 TB this is
    // joining ~(2/25)^2 of the fact rows vs the full two-year window
    val prunedScans =
      """(?s)PushedFilters: \[[^\]]*(Or\(EqualTo\(n_name|In\(n_name|EqualTo\(n_name)"""
        .r.findAllIn(p).length
    assert(prunedScans >= 2,
      s"nation scans not pruned to the named pair (found $prunedScans):\n$p")
  }

  test("TPC-H Q19: one hash join with the disjunction residual, per-side predicates derived") {
    val p = planString(Tpch.qTpchQ19.fn(spark, sf()))
    val f = p.split("== Initial Plan ==").head
    // ONE equi join carries the three-way OR as a residual — not a union
    // of three joins, not a product
    assert(f.contains("BroadcastHashJoin"), s"Q19 lost its hash join:\n$p")
    assert(!f.contains("Union") && !f.contains("Cartesian") && !f.contains("NestedLoop"),
      s"Q19 planned as a union/product:\n$p")
    assert("Scan parquet".r.findAllIn(f).length == 2,
      s"Q19 must scan lineitem + part exactly once each:\n$p")
    // CNF conversion pushes the implied per-side hulls into both scans
    assert("""PushedFilters: \[[^\]]*l_quantity""".r.findAllIn(p).nonEmpty,
      s"quantity hull not pushed to the lineitem scan:\n$p")
    assert("""PushedFilters: \[[^\]]*p_brand""".r.findAllIn(p).nonEmpty,
      s"brand disjunction not pushed to the part scan:\n$p")
  }

  test("TPC-H Q15/Q22: view max is a broadcast row (no window); lapsed check is a hash anti join") {
    val p15 = planString(Tpch.qTpchQ15.fn(spark, sf()))
    val f15 = p15.split("== Initial Plan ==").head
    assert(!f15.contains("Window"), s"Q15 max-over-view fell back to a window sort:\n$p15")
    assert(f15.contains("BroadcastHashJoin"), s"Q15 max row must broadcast:\n$p15")
    val p22 = planString(Tpch.qTpchQ22.fn(spark, sf()))
    assert(p22.contains("LeftAnti"), s"Q22 NOT EXISTS not an anti join:\n$p22")
    assert(!p22.contains("CartesianProduct"),
      s"Q22 threshold join degenerated to a cartesian:\n$p22")
  }

  test("TPC-H Q2/Q9/Q20: derived-partsupp joins stay hash-based; Q16 exclusion is an anti join") {
    // full-string asserts (tiny SFs can zero out final plans via AQE
    // empty-relation propagation; the Initial section keeps the shape).
    // The partsupp derivation attaches the supplier-count SCALAR via a
    // one-row broadcast cross join — the only nested-loop shape allowed:
    // every BNLJ in these plans must be that `, Cross` scalar attach,
    // never an Inner/Outer equi-join fallback.
    def noJoinFallback(p: String, q: String): Unit = {
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      val bnlj = """BroadcastNestedLoopJoin [^\n]*""".r.findAllIn(p).toSeq
      assert(bnlj.forall(_.contains(", Cross")),
        s"$q has a non-scalar nested-loop join: ${bnlj.mkString("; ")}\n$p")
    }
    val p2 = planString(Tpch.qTpchQ2.fn(spark, sf()))
    noJoinFallback(p2, "Q2")
    assert(p2.contains("BroadcastHashJoin"), s"Q2 dims must broadcast:\n$p2")
    val p9 = planString(Tpch.qTpchQ9.fn(spark, sf()))
    noJoinFallback(p9, "Q9")
    val p20 = planString(Tpch.qTpchQ20.fn(spark, sf()))
    assert(p20.contains("LeftSemi"), s"Q20 membership not a semi join:\n$p20")
    noJoinFallback(p20, "Q20")
    val p16 = planString(Tpch.qTpchQ16.fn(spark, sf()))
    assert(p16.contains("LeftAnti"), s"Q16 NOT IN not an anti join:\n$p16")
  }

  test("TPC-H Q7/Q10: dims broadcast, no cartesian, Q10 keeps heap top-k") {
    val p7 = planString(Tpch.qTpchQ7.fn(spark, sf()))
    assert(p7.contains("BroadcastHashJoin"), s"Q7 nation dims must broadcast:\n$p7")
    assert(!p7.contains("CartesianProduct") && !p7.contains("BroadcastNestedLoop"),
      s"Q7 symmetric pair predicate degenerated to a product:\n$p7")
    val p10 = planString(Tpch.qTpchQ10.fn(spark, sf()))
    assert(p10.contains("BroadcastHashJoin"), s"Q10 dims must broadcast:\n$p10")
    assert(p10.contains("TakeOrderedAndProject"),
      s"Q10 top-20 must be per-partition heaps, not a global sort:\n$p10")
  }

  test("domain cap: counts broadcast back, over-cap side is the heap agg, no window") {
    val p = planString(Curation_.qDomainCap.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // domain sizes probe the corpus via broadcast, never a shuffled join
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"domain-count probe must broadcast:\n$p")
    // the capped branch is the bounded heap aggregate — a window sort over
    // the full partition would be the single-reducer scale killer
    assert(finalPlan.contains("top_k_agg"), s"TopKAgg missing:\n$p")
    assert(!finalPlan.contains("RunningWindowFunction") &&
      !finalPlan.contains("row_number"),
      s"domain cap must not fall back to a window sort:\n$p")
  }

  test("bpe encode: merge chain stays on the vocabulary; tokens broadcast-join it") {
    val p = planString(TextAnalysis.qBpeEncode.fn(spark, sf()))
    val finalPlan = p.split("== Initial Plan ==").head
    // encoded vocabulary joins the token stream via broadcast — the corpus
    // is never reshuffled to meet the regex chain
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"token-vocabulary join must broadcast:\n$p")
    assert(!finalPlan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the vocabulary probe:\n$p")
  }

  test("hop window: Expand replication feeds a map-side-combined aggregate, no join") {
    val p = planString(Temporal.qHopWindow.fn(spark, sf()))
    // the 4x window assignment is the scan-stage Expand (window() codegen),
    // never a range join against a generated window table
    assert(p.contains("Expand"), s"window() should plan as Expand:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"hop agg must carry partials:\n$p")
    assert(!p.contains("Join"), s"no join belongs in the hop-window plan:\n$p")
  }

  test("CBO: ANALYZE column stats shrink a filtered-dim estimate and flip the join to broadcast") {
    import org.apache.spark.sql.functions._
    // the statistics-driven planning lever a 100 TB warehouse runs on:
    // without column stats a Filter's size estimate is its child's file
    // size, so a selective dim filter still looks exchange-worthy; after
    // ANALYZE ... FOR COLUMNS the equality predicate estimates rows/ndv
    // and the SAME join flips from shuffle to broadcast. Pin the estimate
    // shrink and the strategy flip with the threshold placed strictly
    // between the two estimates — no magic byte constants, robust to
    // testdata regeneration.
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.sql("DROP TABLE IF EXISTS orders_cbo")
    spark.sql(s"CREATE TABLE orders_cbo USING parquet LOCATION '${sf()}/orders.parquet'")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def dim = spark.table("orders_cbo")
        .filter(col("o_orderpriority") === "1-URGENT")
      def joined = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val s0 = dim.queryExecution.optimizedPlan.stats.sizeInBytes
      spark.sql("ANALYZE TABLE orders_cbo COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderpriority, o_orderkey")
      val s1 = dim.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(s1 < s0, s"column stats did not shrink the filter estimate: $s1 !< $s0")
      val mid = s1 + (s0 - s1) / 2
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", mid.toString)
      // the pin is about the DIM side: does the planner consider the
      // filtered orders frame broadcastable? (the fact side's own pruned
      // projection may broadcast on its own merits — irrelevant here)
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
      def dimBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.sparkPlan.collect {
          case b: BroadcastHashJoinExec =>
            (b.buildSide match {
              case BuildLeft => b.left
              case BuildRight => b.right
            }).toString.contains("orders.parquet")
        }.exists(identity)
      assert(dimBroadcast(joined),
        "stats-informed estimate below threshold must broadcast the dim")
      // drop the stats (recreate the table): back to the file-size
      // estimate, same threshold — the dim must NOT be broadcast
      spark.sql("DROP TABLE orders_cbo")
      spark.sql(s"CREATE TABLE orders_cbo USING parquet LOCATION '${sf()}/orders.parquet'")
      assert(!dimBroadcast(joined),
        "without stats the file-size estimate must keep the dim off the broadcast side")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_cbo")
      prev.foreach { case (k, ov) =>
        ov match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k)
        }
      }
    }
  }

  test("train split: per-row bucket arithmetic, one tiny-key aggregate, no shuffle of docs") {
    val p = planString(Curation_.qTrainSplit.fn(spark, sf()))
    // the split column is scan-stage arithmetic; only (split, lang) partials
    // cross the exchange — no join, no window, text never leaves the scan
    assert(!p.contains("Join") && !p.contains("Window"),
      s"split census must be a bare aggregate:\n$p")
    assert(p.contains("HashAggregate"), s"expected hash aggregate:\n$p")
    assert(!p.toLowerCase.contains("text#"),
      s"document text must not flow past the scan:\n$p")
  }
}
