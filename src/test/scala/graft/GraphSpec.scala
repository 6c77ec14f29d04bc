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
}
