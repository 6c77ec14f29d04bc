package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TRAINER: learn merge rules from a corpus
  * (the counterpart of the fixed-vocabulary segmenter
  * [[graft.functions.SubwordCount]] — that one ships a checked-in unit
  * inventory; this one learns the inventory from data).
  *
  * Classic word-level BPE (Sennrich et al. 2016, public algorithm): start
  * from characters, repeatedly merge the globally most frequent adjacent
  * symbol pair (weighted by word frequency), `nMerges` times.
  *
  * Distributed shape, per round:
  *   - pair counting is one explode of adjacent symbol pairs over the
  *     DISTINCT-word table (already tiny relative to the corpus — the raw
  *     text is scanned exactly once, up front) + one map-side-combined
  *     groupBy; the driver receives ONE row (the argmax pair);
  *   - merge application is one narrow `regexp_replace` projection: words
  *     are kept as separator-joined symbol strings, and the pattern
  *     `\Q|a|b\E(?=\|)` anchors both symbol boundaries while the
  *     lookahead leaves the trailing separator unconsumed, so consecutive
  *     occurrences merge left-to-right exactly like the sequential
  *     algorithm;
  *   - `localCheckpoint` caps the plan at O(1) across rounds (the
  *     `connectedComponents` loop pattern).
  *
  * At 100 TB: the corpus contributes one scan; every round then costs
  * O(distinct words) — the standard practical trainer shape. Driver
  * traffic is nMerges rows total (the model), never data. */
object Bpe {

  private val Sep = "|"

  /** Learn `nMerges` merge rules from `text`. Returns (a, b, freq) in
    * merge order. Deterministic: ties break lexicographically on (a, b),
    * and pair frequencies are exact integers. Words containing the
    * separator character are excluded (document the corpus accordingly).
    *
    * Self-pairs (a == b) are excluded from merge candidates: inside a run
    * of the same symbol the candidate count double-counts overlapping
    * occurrences and the realizable merges depend on scan direction — the
    * one case where left-to-right greedy matching is not canonical. With
    * a ≠ b, symbol-level occurrences are provably disjoint, so the anchored
    * single-pass replace below merges every occurrence — and the DuckDB
    * oracle (`q_bpe_train`) reproduces it exactly with two consume-trailing
    * passes (RE2 has no lookahead; pass 1 can only skip the occurrence
    * immediately after a merge, which pass 2 then catches). */
  def train(df: DataFrame, text: Column, nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 1, s"nMerges $nMerges < 1")
    var cur = df
      .select(explode(split(text, " ")).as("w"))
      .where(length(col("w")) >= 2 && !col("w").contains(Sep))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        concat(lit(Sep), array_join(split(col("w"), ""), Sep), lit(Sep)).as("s"))
      .localCheckpoint() // always local: rebuilding this frame is one cheap scan
    val merges = Seq.newBuilder[(String, String, Long)]
    var exhausted = false
    for (_ <- 0 until nMerges if !exhausted) {
      val syms = filter(split(col("s"), "\\|"), x => length(x) > 0)
      val top = cur
        .select(col("cnt"), syms.as("syms"))
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .where(col("p.a") =!= col("p.b"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is one symbol already
      else {
        val a: String = top(0).getAs[String]("a")
        val b: String = top(0).getAs[String]("b")
        val f: Long = top(0).getAs[Long]("freq")
        merges += ((a, b, f))
        val pat = java.util.regex.Pattern.quote(s"$Sep$a$Sep$b") + "(?=\\|)"
        val rep = java.util.regex.Matcher.quoteReplacement(s"$Sep$a$b")
        val next = graft.Checkpointing.cut(
          cur.select(col("cnt"), regexp_replace(col("s"), pat, rep).as("s")))
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    merges.result()
  }

  /** Distributed BPE ENCODE: replay learned merges over a column of
    * separator-joined symbol strings (`|c|h|a|r|s|`, the trainer's own
    * representation) — one anchored `regexp_replace` per merge, folded
    * into a single narrow projection. Identical regex semantics to the
    * training loop's merge application, so encoding the training corpus
    * reproduces the trainer's final symbol table exactly ([[train]]
    * scaladoc: with self-pairs excluded, occurrences are disjoint and the
    * single anchored left-to-right pass is canonical).
    *
    * At 100 TB the chain runs over the DISTINCT-word table (vocabulary-
    * sized, not corpus-sized); per-document token counts then come from a
    * broadcast join of tokens against the encoded vocabulary. */
  def encodeColumn(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (c, (a, b)) =>
      regexp_replace(
        c,
        lit(java.util.regex.Pattern.quote(s"$Sep$a$Sep$b") + "(?=\\|)"),
        lit(java.util.regex.Matcher.quoteReplacement(s"$Sep$a$b")))
    }

  /** Apply learned merges to one word (BPE encode): start from characters,
    * replay each merge left-to-right non-overlapping — the sequential
    * mirror of the trainer's anchored regexp, used for parity tests and
    * driver-side tokenization of small inputs. */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      if (syms.length >= 2) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }
}
