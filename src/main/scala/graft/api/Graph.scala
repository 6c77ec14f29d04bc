package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain (src, dst) edge DataFrames —
  * PageRank here; connected components live in [[TextDedup.connectedComponents]].
  *
  * All rank arithmetic is INTEGER, in micro-units (1.0 → 1,000,000):
  * per-edge contributions are `rank div out_degree` and the damping step is
  * `150_000 + (850_000 * Σcontrib) div 1_000_000`. Floor division on
  * non-negative longs is identical in every engine, so a fixed iteration
  * count yields a bit-exact, oracle-replayable result — no float
  * accumulation-order sensitivity, ever.
  *
  * Scale shape (100 TB of edges): the edge frame joins ranks on `src` each
  * round. Edges are degree-annotated, hash-partitioned on `src` and
  * persisted ONCE up front, so every iteration re-uses that layout and
  * ships only the (node, rank) frame — 16 bytes/node — through the join;
  * the transpose shuffle (groupBy `dst`) likewise carries 16-byte rows.
  * Per round: one join + one aggregate, the Pregel communication pattern
  * expressed relationally. [[graft.Checkpointing.cut]] caps lineage at O(1)
  * like the connected-components loop (api/TextDedup.scala) — local blocks
  * by default, reliable files when `spark.graft.checkpointDir` is set.
  */
object Graph {

  val Unit1: Long = 1000000L

  /** Fixed-iteration integer PageRank with damping 0.85.
    *
    * `edges` must have long-typed `src`, `dst` columns. Every node is
    * expected to appear as a source (feed symmetric edges if the raw
    * relation is one-directional — also the standard dangling-node fix);
    * nodes receiving no contributions in a round settle at the damping
    * floor 150_000. Returns (node, rank) with Σrank ≤ nodes · 10^6
    * (floor-division loss only).
    */
  def pageRankInt(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be 1..50, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    // degree-annotated edges, laid out by src once, reused every round
    val edgesDeg = graft.Persisting.maybe(
      e.join(deg, "src").repartition(col("src")))
    val nodes = graft.Persisting.maybe(e.select(col("src").as("node")).distinct())

    var ranks = nodes.select(col("node"), lit(Unit1).as("r"))
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div d").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("c"))
      ranks = graft.Checkpointing.cut(
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            expr("150000L + (850000L * coalesce(c, 0L)) div 1000000L").as("r")))
    }
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Per-node triangle participation counts via degree-ordered edge
    * orientation + out-neighborhood intersection (Chiba–Nishizeki /
    * Schank's forward algorithm).
    *
    * `und` must be the DISTINCT undirected edge set as (u, v) with u < v.
    * Each edge is oriented low→high by the total order (degree, id); a
    * triangle {a ≺ b ≺ c} then materializes exactly once, AT edge (a, b),
    * as witness c ∈ N⁺(a) ∩ N⁺(b). Attribution: a and b each earn the
    * edge's intersection size, every witness earns 1 — no wedge frame is
    * ever materialized. The intersection runs in the codegen'd two-pointer
    * [[graft.functions.SortedIntersect]] over sorted adjacency arrays.
    *
    * Why this survives 100 TB where the naive `u < v < w` self-join dies:
    * the wedge-join formulation shuffles Σ out-deg² rows (83 M at sf0.1
    * here, measured; unbounded on power-law hubs), while this shape
    * shuffles only the adjacency build (one groupBy over m edges) and the
    * edge↔adjacency joins (m rows), with the Σ-out-deg² work collapsing
    * into in-core merge loops. Degree orientation additionally bounds
    * out-degrees by O(√m), so hub intersections stay short; adjacency
    * arrays exceed a broadcast budget only past ~10⁷ edges, at which point
    * the same joins run as co-partitioned shuffles — shape unchanged.
    */
  def triangleNodeCounts(und: DataFrame): DataFrame = {
    import graft.functions.SortedIntersect.sorted_intersect
    val e0 = und.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
    val deg = e0.select(col("u").as("node")).unionAll(e0.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val lt = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented =
      e0.join(deg.select(col("node").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
        .select(
          when(lt, col("u")).otherwise(col("v")).as("src"),
          when(lt, col("v")).otherwise(col("u")).as("dst"))
    val adj = oriented.groupBy(col("src").as("n"))
      .agg(sort_array(collect_set(col("dst"))).as("nbrs"))
    // v may have no out-edges (left join); u always has ≥ 1 (this edge)
    val perEdge = graft.Persisting.maybe(
      oriented
        .join(adj.select(col("n").as("src"), col("nbrs").as("nu")), "src")
        .join(adj.select(col("n").as("dst"), col("nbrs").as("nv")), Seq("dst"), "left")
        .select(col("src"), col("dst"),
          sorted_intersect(col("nu"),
            coalesce(col("nv"), array().cast("array<long>"))).as("wit")))
    val endpoints = perEdge
      .select(explode(array(col("src"), col("dst"))).as("node"), size(col("wit")).as("w"))
    val witnesses = perEdge.select(explode(col("wit")).as("node"), lit(1).as("w"))
    endpoints.unionByName(witnesses)
      .groupBy("node").agg(sum(col("w")).cast("long").as("tri_cnt"))
      .filter(col("tri_cnt") > 0)
  }
}
