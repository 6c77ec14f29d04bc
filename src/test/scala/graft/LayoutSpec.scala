package graft

import graft.api.Layout
import org.apache.spark.sql.functions._

/** Z-order layout (api/Layout.scala): Morton-curve correctness plus the
  * claim that justifies it at scale — files clustered by z bound BOTH key
  * dimensions, so a two-sided box predicate skips most files, while a
  * single-column sort leaves the second dimension unbounded per file.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: interleave bits of x (even) and y (odd). */
  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue2 matches the bit-interleave reference on planted points") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 9L),
      (65535L, 65535L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y, 16), s"z($x, $y)")
    }
    // locality sanity: unit square corners are the first 4 curve cells
    assert(Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).map(got) == Seq(0L, 1L, 2L, 3L))
  }

  test("z-order files bound BOTH dimensions; single-column sort does not") {
    val numFiles = 16
    // 64x64 grid, one row per cell — a uniform 2-D key distribution
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"))

    def spans(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
          r.getAs[Long]("y0"), r.getAs[Long]("y1")))

    val zSpans = spans(Layout.zOrder2(grid, col("x"), col("y"), numFiles, bits = 6))
    val xSpans = spans(grid.repartitionByRange(numFiles, col("x"))
      .sortWithinPartitions("x"))

    // box query: x in [8, 15] and y in [8, 15] (1/64 of the space)
    def hits(s: Array[(Long, Long, Long, Long)]): Int =
      s.count { case (x0, x1, y0, y1) => x1 >= 8 && x0 <= 15 && y1 >= 8 && y0 <= 15 }

    val zHits = hits(zSpans)
    val xHits = hits(xSpans)
    // x-sort: every x-matching partition spans all of y -> no y pruning.
    // z-order: partitions are compact boxes -> most miss the query box.
    assert(zHits < xHits,
      s"z-order should prune more files: z=$zHits x=$xHits of $numFiles")
    assert(zHits <= numFiles / 4,
      s"z-order box bounds too loose: $zHits of $numFiles files overlap a 1/64 box")
  }

  test("z-order write round-trips rows unchanged (layout only, no data change)") {
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_linenumber",
      "l_partkey", "l_suppkey")
    val laid = Layout.zOrder2(li, col("l_partkey"), col("l_suppkey"), 4)
    assert(laid.count() == li.count())
    assert(laid.unionAll(li).distinct().count() == li.distinct().count())
  }

  test("compact: fragmented directory rewrites to few disjoint-range files, rows intact") {
    val inDir = java.nio.file.Files.createTempDirectory("frag").toString + "/t"
    val outDir = inDir + "-compacted"
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_partkey", "l_quantity")
    li.repartition(64).write.parquet(inDir) // the streaming-ingest mess
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files(inDir).length == 64)

    val n = Layout.compact(spark, inDir, outDir, col("l_orderkey"),
      targetRowsPerFile = 2000)
    val out = files(outDir)
    assert(out.length == n && n == math.ceil(li.count() / 2000.0).toInt,
      s"expected $n files, found ${out.length}")

    // rows survive exactly
    val re = spark.read.parquet(outDir)
    assert(re.count() == li.count())
    assert(re.unionAll(li).distinct().count() == li.distinct().count())

    // range clustering: per-file key ranges are pairwise disjoint, so the
    // rewrite buys min/max skipping on the key as well as fewer files
    val ranges = out.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("l_orderkey"),
          org.apache.spark.sql.functions.max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"overlapping file ranges: $a vs $b")
      case _ =>
    }
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    val o = Tables.orders(spark, sf()).select("o_orderkey", "o_orderstatus")
    val li = Tables.lineitem(spark, sf())
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Layout.writeBucketed(o, "orders_b", "o_orderkey", buckets = 4)
    Layout.writeBucketed(li, "lineitem_b", "o_orderkey", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the join must pick a shuffle strategy — the
      // bucketing is what must eliminate the exchanges, not a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val expected = o.join(li, "o_orderkey").count()
      assert(joined.count() == expected, "bucketed join changed the result")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle either side:\n$plan")
      // same join over the plain frames DOES shuffle — the layout is load-bearing
      val plain = o.join(li, "o_orderkey")
      plain.count()
      assert(plain.queryExecution.executedPlan.toString().contains("Exchange"),
        "control: the unbucketed join was expected to exchange")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("q_smb_join: self-gate passes and result equals the plain join") {
    val got = operators.LayoutOps.qSmbJoin.fn(spark, sf()).collect()
    val exp = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity").cast("decimal(18,6)")).cast("double"), 2).as("sum_qty"))
      .orderBy("o_orderpriority").collect()
    assert(got.toSeq == exp.toSeq, "bucket-routed join diverged from the plain join")
  }

  test("q_partition_prune: self-gate passes and rows equal the flat filter") {
    val got = operators.LayoutOps.qPartitionPrune.fn(spark, sf()).collect()
    val ev = Tables.events(spark, sf())
    val minDay = ev.agg(min(to_date(date_trunc("day", col("ts"))))).first().getDate(0)
    val exp = ev.where(to_date(date_trunc("day", col("ts"))) === lit(minDay))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .orderBy("event_id").collect()
    assert(got.toSeq == exp.toSeq, "pruned read diverged from the flat filtered scan")
  }

  test("q_dpp_join: self-gate passes, result equals the flat join, DPP in the executed plan") {
    val df = operators.LayoutOps.qDppJoin.fn(spark, sf())
    val got = df.collect()
    val ev = Tables.events(spark, sf())
    val minDom = ev.agg(min(to_date(date_trunc("day", col("ts"))))).first()
      .getDate(0).toLocalDate.getDayOfMonth % 5
    val exp = ev
      .select(to_date(date_trunc("day", col("ts"))).as("day"), col("value"))
      .where(dayofmonth(col("day")) % 5 === lit(minDom))
      .groupBy("day")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"))
      .orderBy("day").collect()
    assert(got.toSeq == exp.toSeq, "runtime-pruned join diverged from the flat join")
    // the selector keeps a strict subset of days — pruning has something to skip
    val allDays = ev.select(to_date(date_trunc("day", col("ts"))).as("day")).distinct().count()
    assert(got.length > 0 && got.length < allDays,
      s"mod-5 day selector degenerate: ${got.length} of $allDays days")
    // and the fact scan carries the runtime pruning subquery in the final plan
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("dynamicpruningexpression"),
      s"fact scan carries no runtime partition-pruning subquery:\n$p")
  }

  test("partitioned layout: partition filter prunes directories, not just rows") {
    val dir = java.nio.file.Files.createTempDirectory("part-layout").toString + "/events"
    val ev = Tables.events(spark, sf())
      .withColumn("day", org.apache.spark.sql.functions.dayofmonth(col("ts")))
    Layout.writePartitioned(ev, dir, "day")

    val all = spark.read.parquet(dir)
    val one = all.filter(col("day") === 5)
    val n = one.count()
    assert(n > 0 && n < all.count())
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("(day"),
      s"partition filter not pushed to directory pruning:\n$scan")
    // the pruned scan must touch ONLY the matching directory's files:
    // numFiles is the scan's POST-PRUNING metric (inputFiles would report
    // the whole relation)
    def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    }
    val prunedFiles = numFiles(one)
    val allFiles = numFiles(spark.read.parquet(dir))
    assert(prunedFiles >= 1 && prunedFiles < allFiles,
      s"no directory pruning: read $prunedFiles of $allFiles files")
    assert(prunedFiles <= allFiles / 10,
      s"pruning too weak for a 30-day layout: $prunedFiles of $allFiles")
  }
}
