package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint as ONE imperative aggregate.
  *
  * The declarative formulation — `bits` separate
  * `sum(cnt * (2*((h>>i)&1)-1))` aggregates followed by a `bits`-term CASE
  * chain — is semantically identical but generates a codegen unit so large
  * that C2 often cannot compile it before a query finishes, leaving the
  * whole aggregation interpreted (PERF_NOTES.md). This class keeps a
  * primitive `long[bits]` buffer and a tight update loop; the generated
  * plan code shrinks to a plain aggregate call.
  *
  * eval folds the buffer into the fingerprint: bit i is set iff the
  * weighted bit-sum is positive — exactly the oracle's
  * `CASE WHEN s_i > 0 THEN 1<<i END` sum, so DuckDB results are unchanged.
  *
  * Inputs: `hash` BIGINT (word hash), `cnt` BIGINT (occurrences).
  */
case class SimhashAgg(
    left: Expression,
    right: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(bits >= 1 && bits <= 56, s"bits $bits out of range")

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = left.eval(input)
    val cv = right.eval(input)
    if (hv != null && cv != null) {
      val h = hv.asInstanceOf[Long]
      val c = cv.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        buf(i) += c * (((h >> i) & 1L) * 2 - 1)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var f = 0L
    var i = 0
    while (i < bits) {
      if (buf(i) > 0) f |= 1L << i
      i += 1
    }
    f
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * bits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimhashAgg =
    copy(left = l, right = r)
}

object SimhashAgg {
  import org.apache.spark.sql.graft.ColumnBridge

  /** `simhash_agg(hash, cnt, bits)` as an aggregate Column. */
  def simhash_agg(hash: Column, cnt: Column, bits: Int): Column =
    ColumnBridge.column(
      SimhashAgg(ColumnBridge.expression(hash), ColumnBridge.expression(cnt), bits)
        .toAggregateExpression())
}
