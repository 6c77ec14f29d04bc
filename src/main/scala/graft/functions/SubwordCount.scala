package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-prefix subword tokenization count of ONE word against
  * the checked-in vocabulary [[SubwordCount.Vocab]] — a real segmenting
  * tokenizer (the greedy/WordPiece decode rule over a BPE-shaped unit
  * inventory), replacing the `(len+3)/4` closed-form estimate whose error
  * is systematic off English-like text.
  *
  * Rule: at each position consume the LONGEST vocabulary unit that
  * prefixes the remainder, else one character (every character is an
  * implicit 1-unit fallback, so the count is total — no <unk>). The rule
  * is order-free and deterministic, which is what lets the DuckDB oracle
  * replay it exactly with a recursive CTE over the same vocabulary
  * (`TextAnalysis.qTextTokens`).
  *
  * Codegen'd via a static-helper call ([[Md5Long56]] pattern) so the count
  * stays inside whole-stage codegen; per word it is a few hash probes
  * (one per candidate length), no allocation beyond the substring keys. */
case class SubwordCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_count"

  protected override def nullSafeEval(v: Any): Any =
    SubwordCount.countWord(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SubwordCount.countWord($c.toString());")

  override protected def withNewChildInternal(c: Expression): SubwordCount = copy(child = c)
}

object SubwordCount {

  /** The subword unit inventory: the standard ~50 most frequent English
    * letter bigrams plus frequent trigram/4-gram merges — the shape (not
    * the learned weights) of an early-merge BPE vocabulary. Checked in as
    * code so the Spark expression and the SQL oracle share one source of
    * truth ([[vocabValuesSql]]). Single characters are implicit units. */
  val Vocab: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur",
    "the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her", "ter",
    "ere", "ate", "ver", "all", "men", "ith", "ted", "ers", "est",
    "tion", "ment")

  /** DuckDB inline-VALUES rendering of [[Vocab]] as `vocab(s, l)`. */
  def vocabValuesSql: String =
    Vocab.map(s => s"('$s', ${s.length})").mkString(", ")

  private val maxLen = Vocab.map(_.length).max
  private val byLength: Array[java.util.HashSet[String]] = {
    val a = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    Vocab.foreach(s => a(s.length).add(s))
    a
  }

  /** Entry point referenced from generated code. */
  def countWord(w: String): Int = {
    var pos = 0
    var cnt = 0
    while (pos < w.length) {
      var step = 1
      var l = math.min(maxLen, w.length - pos)
      while (l >= 2 && step == 1) {
        if (byLength(l).contains(w.substring(pos, pos + l))) step = l
        l -= 1
      }
      pos += step
      cnt += 1
    }
    cnt
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** `subword_count(word)` as a Column. */
  def subword_count(word: Column): Column =
    ColumnBridge.column(SubwordCount(ColumnBridge.expression(word)))
}
