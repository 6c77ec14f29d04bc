package graft

import graft.api.Graph
import org.apache.spark.sql.functions._

/** Unit tests for integer PageRank (api/Graph.scala): the distributed
  * result must equal a sequential integer reference bit-for-bit, and the
  * ranking must reflect graph structure.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential mirror of [[Graph.pageRankInt]]'s integer arithmetic. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .groupBy(_._2)
        .view.mapValues(es => es.map { case (s, _) => r(s) / out(s) }.sum)
        .toMap
      r = nodes.map(n => n -> (150000L + 850000L * contrib.getOrElse(n, 0L) / 1000000L)).toMap
    }
    r
  }

  private def sym(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs ++ pairs.map(_.swap)

  test("pageRankInt equals the sequential integer reference bit-for-bit") {
    // hub node 1 connected to 2..6; chain 6-7-8
    val edges = sym(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 1L -> 6L,
      6L -> 7L, 7L -> 8L)
    val got = Graph.pageRankInt(edges.toDF("src", "dst"), iters = 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got == refPageRank(edges, 5))
  }

  test("hub outranks leaves; rank mass is conserved up to floor loss") {
    val edges = sym(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 1L -> 6L)
    val r = Graph.pageRankInt(edges.toDF("src", "dst"), iters = 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(1L) > r(2L), s"hub should outrank leaf: $r")
    assert(r(2L) == r(6L), "symmetric leaves must tie exactly")
    val total = r.values.sum
    // 6 nodes * 1e6 initial mass; floor division only ever loses mass
    assert(total <= 6000000L && total > 5400000L, s"mass off: $total")
  }

  test("disconnected node set: each component ranks independently") {
    val compA = sym(1L -> 2L)
    val compB = sym(10L -> 11L, 10L -> 12L)
    val r = Graph.pageRankInt((compA ++ compB).toDF("src", "dst"), iters = 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val ra = refPageRank(compA, 3)
    val rb = refPageRank(compB, 3)
    assert(r.view.filterKeys(Set(1L, 2L)).toMap == ra)
    assert(r.view.filterKeys(Set(10L, 11L, 12L)).toMap == rb)
  }

  test("edge layout is built once: ranks-side join, per-round plans stay bounded") {
    val edges = sym(1L -> 2L, 2L -> 3L, 3L -> 4L).toDF("src", "dst")
    // 10 iterations must not blow up lineage (localCheckpoint caps plans)
    val r = Graph.pageRankInt(edges, iters = 10).collect()
    assert(r.length == 4)
  }

  test("triangles: known graph — K4 plus a pendant edge") {
    import spark.implicits._
    // K4 on {1,2,3,4} has C(4,3)=4 triangles, each node in 3; node 5 in 0.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("u", "v")
    val got = Graph.triangleNodeCounts(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("triangles: oriented algorithm matches naive u<v<w enumeration at sf0.001") {
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_partkey").distinct()
    val und = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("u"), col("y.l_partkey").as("v"))
      .distinct().cache()
    val oriented = Graph.triangleNodeCounts(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: tri {a<b<c} iff all three edges present, per-node counts
    val edges = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val adj = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    for ((a, bs) <- adj; b <- bs; c <- adj.getOrElse(b, Set.empty)
         if edges.contains((a, c))) {
      naive(a) += 1; naive(b) += 1; naive(c) += 1
    }
    assert(oriented == naive.toMap, s"mismatch: oriented=$oriented naive=$naive")
    assert(nodes.nonEmpty && naive.nonEmpty, "degenerate test: no triangles at sf0.001")
  }
}
