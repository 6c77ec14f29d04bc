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
}
