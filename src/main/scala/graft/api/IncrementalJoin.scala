package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    aBatches.zip(bBatches).zipWithIndex.foreach { case ((dA, dB), i) =>
      val deltaJ = Seq(
        bAcc.map(b => dA.join(b, keys)), // ΔA ⋈ B_prev
        aAcc.map(a => a.join(dB, keys)), // A_prev ⋈ ΔB
        Some(dA.join(dB, keys))          // ΔA ⋈ ΔB
      ).flatten.reduce(_ unionByName _)
      view = Some(view.fold(deltaJ)(_ unionByName deltaJ))
      if (i < aBatches.length - 1) { // the last step's accumulators are never read
        aAcc = Some(graft.Checkpointing.cut(aAcc.fold(dA)(_ unionByName dA)))
        bAcc = Some(graft.Checkpointing.cut(bAcc.fold(dB)(_ unionByName dB)))
      }
    }
    view.get
  }

  /** Signed (insert/retract) variant — full IVM, not just the insert-only
    * case: each delta row carries `signCol` = +1 (insert) or -1 (retract),
    * inputs and view are signed bags. The same delta rule applies with
    * multiplicities MULTIPLYING through the join
    * (count_J(a⋈b) = count_A(a) · count_B(b), so Δ terms carry the sign
    * product). Returns the signed increment stream; [[net]] collapses it
    * to the current view. A retraction arriving before its partner row
    * simply drives the pair's net count to 0 when the partner lands —
    * no ordering constraints between sides.
    *
    * This is the relational core of differential/incremental view
    * maintenance with deletions (the CDC U/D/I feed of `q_merge_upsert`
    * maps to it directly: U = retract old + insert new). */
  /** Join two signed bags: multiplicities multiply, so the result's sign
    * column is the product. Shared with [[graft.streaming.StreamJoinView]]. */
  private[graft] def joinSignedPair(a: DataFrame, b: DataFrame,
      keys: Seq[String], signCol: String): DataFrame =
    a.withColumnRenamed(signCol, "__sa")
      .join(b.withColumnRenamed(signCol, "__sb"), keys)
      .withColumn(signCol, col("__sa") * col("__sb"))
      .drop("__sa", "__sb")

  def maintainSigned(aBatches: Seq[DataFrame], bBatches: Seq[DataFrame],
      keys: Seq[String], signCol: String = "sign"): DataFrame = {
    require(aBatches.nonEmpty && aBatches.length == bBatches.length,
      s"batch sequences must align: ${aBatches.length} vs ${bBatches.length}")
    def joinSigned(a: DataFrame, b: DataFrame): DataFrame =
      joinSignedPair(a, b, keys, signCol)
    var aAcc: Option[DataFrame] = None
    var bAcc: Option[DataFrame] = None
    var view: Option[DataFrame] = None
    aBatches.zip(bBatches).zipWithIndex.foreach { case ((dA, dB), i) =>
      val deltaJ = Seq(
        bAcc.map(b => joinSigned(dA, b)),
        aAcc.map(a => joinSigned(a, dB)),
        Some(joinSigned(dA, dB))
      ).flatten.reduce(_ unionByName _)
      view = Some(view.fold(deltaJ)(_ unionByName deltaJ))
      if (i < aBatches.length - 1) { // the last step's accumulators are never read
        aAcc = Some(graft.Checkpointing.cut(aAcc.fold(dA)(_ unionByName dA)))
        bAcc = Some(graft.Checkpointing.cut(bAcc.fold(dB)(_ unionByName dB)))
      }
    }
    view.get
  }

  /** Collapse a signed increment stream to the current view: net count per
    * distinct row, rows with net ≤ 0 gone. */
  def net(view: DataFrame, signCol: String = "sign"): DataFrame = {
    val payload = view.columns.filterNot(_ == signCol).toSeq
    view.groupBy(payload.map(org.apache.spark.sql.functions.col): _*)
      .agg(sum(col(signCol)).as("net_count"))
      .filter(col("net_count") > 0)
  }
}
