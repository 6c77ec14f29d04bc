package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs, ordered by
  * (score DESC, id ASC), as a size-k min-heap in the aggregation buffer.
  *
  * This is the scale-safe replacement for the
  * `row_number() OVER (PARTITION BY qid ORDER BY score DESC)` top-k pattern:
  * the window form shuffles every scored row to one reducer per partition
  * key (parallelism = number of queries — a single-reducer sort when the
  * query set is small), while this aggregate reduces each map partition to
  * at most k entries per group BEFORE the exchange, so the shuffle carries
  * O(k × partitions) rows per group instead of O(corpus).
  *
  * Output: `ARRAY<STRUCT<id BIGINT, score DOUBLE>>`, best first, exactly the
  * rows the window formulation would keep (ties broken by ascending id; null
  * scores/ids are ignored, matching DESC-nulls-last windows whenever a group
  * has at least k non-null rows).
  */
case class TopKAgg(
    left: Expression,   // score DOUBLE
    right: Expression,  // id BIGINT
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKAgg.Entry]]
  with ExpectsInputTypes with BinaryLike[Expression] {

  require(k >= 1, s"k must be positive, got $k")

  // analysis-time validation: an INT id or DECIMAL score is an
  // AnalysisException here, not an executor-side ClassCastException
  override def inputTypes = Seq(DoubleType, LongType) // score, id

  override def prettyName: String = "top_k_agg"
  override def dataType: DataType = TopKAgg.OutType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKAgg.Entry] =
    new java.util.PriorityQueue[TopKAgg.Entry](k + 1, TopKAgg.WorstFirst)

  private def offer(heap: java.util.PriorityQueue[TopKAgg.Entry], e: TopKAgg.Entry): Unit =
    if (heap.size < k) heap.add(e)
    else if (TopKAgg.WorstFirst.compare(e, heap.peek) > 0) { heap.poll(); heap.add(e) }

  override def update(
      heap: java.util.PriorityQueue[TopKAgg.Entry],
      input: InternalRow): java.util.PriorityQueue[TopKAgg.Entry] = {
    val sv = left.eval(input)
    val iv = right.eval(input)
    if (sv != null && iv != null) {
      offer(heap, TopKAgg.Entry(sv.asInstanceOf[Double], iv.asInstanceOf[Long]))
    }
    heap
  }

  override def merge(
      h1: java.util.PriorityQueue[TopKAgg.Entry],
      h2: java.util.PriorityQueue[TopKAgg.Entry]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val it = h2.iterator()
    while (it.hasNext) offer(h1, it.next())
    h1
  }

  override def eval(heap: java.util.PriorityQueue[TopKAgg.Entry]): Any = {
    // drain a COPY: eval must not mutate the buffer (the non-destructive
    // convention of e.g. ApproximatePercentile — a window/running use would
    // call eval repeatedly on the same buffer)
    val copy = new java.util.PriorityQueue[TopKAgg.Entry](TopKAgg.WorstFirst)
    copy.addAll(heap)
    val arr = new Array[TopKAgg.Entry](copy.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = copy.poll(); i -= 1 } // drain worst-first → best-first array
    new GenericArrayData(arr.map(e => InternalRow(e.id, e.score)): Array[Any])
  }

  override def serialize(heap: java.util.PriorityQueue[TopKAgg.Entry]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * heap.size)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e.score); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.add(TopKAgg.Entry(bb.getDouble, bb.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKAgg =
    copy(left = l, right = r)
}

object TopKAgg {
  final case class Entry(score: Double, id: Long)

  /** Heap order: the WORST kept entry at the head (so the head is evicted
    * when a better one arrives). "Better" = higher score, then lower id. */
  val WorstFirst: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }

  val OutType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  import org.apache.spark.sql.graft.ColumnBridge

  /** `top_k_agg(score, id, k)` as an aggregate Column. */
  def top_k_agg(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
