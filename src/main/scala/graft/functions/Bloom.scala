package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bloom-filter build + membership for join pruning.
  *
  * The scale problem: a selective dimension-side predicate should cut the
  * fact-side shuffle, but when the dimension is too large to broadcast as
  * an exact hash relation, a plain shuffle join moves EVERY fact row.
  * A bloom filter over the dimension join keys is ~1.2 bytes/key at 1 %
  * fpp — broadcastable at dimension sizes where the exact build side is
  * not — and filters the fact rows BEFORE the exchange, so the shuffle
  * carries only (selectivity + fpp) of the fact table. False positives are
  * removed by the real join that follows; the final result is exactly the
  * plain join's (which is what the DuckDB oracle checks).
  *
  * Spark's own runtime-filter rule (`InjectRuntimeFilter`) does this only
  * for a planner-chosen subset of shapes; this pair makes the pattern an
  * explicit, composable operator.
  *
  * Layout: the filter is `m` bits (power of two) in `m/64` longs; `k` set
  * positions per key via double hashing (Kirsch–Mitzenmacher: pos_i =
  * h1 + i·h2 mod m) over the 64-bit input hash — the input is expected to
  * be `xxhash64(key)` (codegen'd builtin; the bloom never needs oracle
  * reproducibility because it cannot change the result, only prune work).
  */
object Bloom {

  /** Aggregate a hash column into a serialized bloom filter (BinaryType,
    * little-endian longs). Model-sized output: collect like any sketch. */
  def bloomAgg(hash: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(hash), numBits, numHashes)
        .toAggregateExpression())

  /** Membership test against a driver-collected filter, codegen'd. */
  def mightContain(hash: Column, bits: Array[Byte], numHashes: Int): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(hash), Bloom.toLongs(bits), numHashes))

  private[functions] def toLongs(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  private[graft] def set(words: Array[Long], h: Long, k: Int): Unit = {
    val m = words.length.toLong * 64
    val h2 = (h >>> 33) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h + i * h2, m)
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  private[graft] def contains(words: Array[Long], h: Long, k: Int): Boolean = {
    val m = words.length.toLong * 64
    val h2 = (h >>> 33) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h + i * h2, m)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom build as a typed imperative aggregate: the buffer IS the word
  * array, merge is bitwise OR — associative and partition-order-free. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes out of range: $numHashes")

  override def inputTypes = Seq(LongType)
  override def prettyName: String = "bloom_build_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.toLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBuildAgg =
    copy(child = c)
}

/** `bloom_might_contain(hash)` against an embedded word array; stays inside
  * whole-stage codegen so the pre-shuffle filter costs a few ALU ops/row. */
case class BloomMightContain(
    child: Expression,
    words: Array[Long],
    numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(h: Any): Any =
    Bloom.contains(words, h.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val w = ctx.addReferenceObj("bloomWords", words, "long[]")
      val m = ctx.freshName("m")
      val h2 = ctx.freshName("h2")
      val pos = ctx.freshName("pos")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      s"""
         |long $m = ${words.length}L * 64;
         |long $h2 = ($h >>> 33) | 1L;
         |boolean $ok = true;
         |for (int $i = 0; $i < $numHashes && $ok; $i++) {
         |  long $pos = Long.remainderUnsigned($h + $i * $h2, $m);
         |  $ok = ($w[(int)($pos >>> 6)] & (1L << ($pos & 63))) != 0L;
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  // the case-class equals/hashCode on an Array field is reference-based —
  // two semantically identical filters would never compare equal, defeating
  // canonicalization / subexpression elimination / codegen reuse. Compare
  // contents, as Spark's own literal-array-bearing expressions do.
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContain =>
      child == o.child && numHashes == o.numHashes &&
        java.util.Arrays.equals(words, o.words)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(numHashes),
    Integer.valueOf(java.util.Arrays.hashCode(words)))

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
