package graft.api

import org.apache.spark.sql.DataFrame

/** Incremental JOIN-view maintenance — the delta rule for materialized
  * views over append-only inputs, the join-side counterpart of
  * [[graft.streaming.IncrementalAgg]]'s partial-aggregate merge.
  *
  * After ingesting delta batches (ΔA, ΔB), the view advances by
  *
  * {{{  ΔJ = ΔA ⋈ B_prev  ∪  A_prev ⋈ ΔB  ∪  ΔA ⋈ ΔB  }}}
  *
  * so the maintained view equals the full join of everything ingested so
  * far while each step costs O(Δ ⋈ accumulated) — the view itself is never
  * rescanned or rebuilt, and nothing ever joins A_full ⋈ B_full.
  *
  * Scale shape (100 TB): a day's delta is small relative to the
  * accumulated sides, so the two cross terms run as small-side
  * broadcast/shuffle joins against key-partitioned history, and ΔA ⋈ ΔB is
  * delta-sized. A production deployment stores A/B bucketed by the join
  * key so each delta join is co-partitioned (no history shuffle) and
  * appends the view as new partitions — the relational core of what
  * stream-stream joins keep in state stores, expressed over batch files.
  * Per-step lineage is capped by [[graft.Checkpointing.cut]] (reliable
  * checkpoint on clusters via `spark.graft.checkpointDir`).
  *
  * Inner equi-join, append-only deltas (no retractions): the standard
  * insert-only IVM case. Reference provenance: the reference recomputes
  * nothing (pure pass-through streaming) — this is the maintenance layer a
  * stored deployment of the same data needs.
  */
object IncrementalJoin {

  /** Run `n` maintenance steps and return the final view. `aBatches` and
    * `bBatches` align positionally (use empty frames for quiet sides). */
  def maintain(aBatches: Seq[DataFrame], bBatches: Seq[DataFrame],
      keys: Seq[String]): DataFrame = {
    require(aBatches.nonEmpty && aBatches.length == bBatches.length,
      s"batch sequences must align: ${aBatches.length} vs ${bBatches.length}")
    var aAcc: Option[DataFrame] = None
    var bAcc: Option[DataFrame] = None
    var view: Option[DataFrame] = None
    aBatches.zip(bBatches).foreach { case (dA, dB) =>
      val deltaJ = Seq(
        bAcc.map(b => dA.join(b, keys)), // ΔA ⋈ B_prev
        aAcc.map(a => a.join(dB, keys)), // A_prev ⋈ ΔB
        Some(dA.join(dB, keys))          // ΔA ⋈ ΔB
      ).flatten.reduce(_ unionByName _)
      view = Some(view.fold(deltaJ)(_ unionByName deltaJ))
      aAcc = Some(graft.Checkpointing.cut(aAcc.fold(dA)(_ unionByName dA)))
      bAcc = Some(graft.Checkpointing.cut(bAcc.fold(dB)(_ unionByName dB)))
    }
    view.get
  }
}
