package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Bloom
import org.apache.spark.sql.functions._

/** Join acceleration via bloom-filter semi-join pruning (SURVEY.md §2.B).
  *
  * Reference provenance: the reference has no joins at all (its only
  * routing is a per-record predicate, DataStreamProcessingJob.java:53-55);
  * this is engine capability for the batch/warehouse side.
  *
  * The operator demonstrates the canonical 100 TB pattern: a selective
  * dimension predicate (here status F + urgent priority ≈ 6 % of orders)
  * should prune the fact-side SHUFFLE, not just the post-join result. The
  * dimension keys aggregate into a [[graft.functions.BloomBuildAgg]]
  * (m = 2²⁰ bits = 128 KB regardless of key count — broadcastable when an
  * exact build side is not), and the fact scan applies the codegen'd
  * [[graft.functions.BloomMightContain]] BEFORE its exchange, so the
  * shuffle moves ≈ selectivity + fpp of lineitem instead of all of it.
  * False positives are eliminated by the real join that follows — the
  * result is bit-identical to the plain join, which is exactly what the
  * DuckDB oracle asserts. `JoinAccelSpec` pins the pruning (no false
  * negatives; pruned fact ≪ total) and the pre-exchange plan placement.
  */
object JoinAccel {

  private val DimPred = "o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'"

  val qBloomJoin: QueryDef = QueryDef.sql(
    "q_bloom_join",
    s"""SELECT l.l_returnflag,
       |       count(*) AS n_lines,
       |       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE $DimPred
       |GROUP BY l.l_returnflag
       |ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
    val dim = Tables.orders(s, d).filter(expr(DimPred))
    val fact = bloomPruned(dim, Tables.lineitem(s, d))
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double"), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** lineitem filtered by a bloom over the dim's join keys. Exposed for
    * the spec, which measures pruning and false-negative-freedom. */
  private[graft] def bloomPruned(
      dim: org.apache.spark.sql.DataFrame,
      lineitem: org.apache.spark.sql.DataFrame,
      numBits: Int = 1 << 20,
      numHashes: Int = 5): org.apache.spark.sql.DataFrame = {
    // model-sized collect (128 KB), same pattern as every sketch fit
    val bits = dim
      .agg(Bloom.bloomAgg(xxhash64(col("o_orderkey")), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    lineitem.filter(Bloom.mightContain(xxhash64(col("l_orderkey")), bits, numHashes))
  }

  val all: Seq[QueryDef] = Seq(qBloomJoin)
}
