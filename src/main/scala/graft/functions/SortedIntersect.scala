package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sorted_intersect(a, b)` over two ASCENDING-sorted `ARRAY<BIGINT>`
  * columns: the classic two-pointer merge, O(|a| + |b|) with zero
  * allocation beyond the result.
  *
  * Built for the triangle-counting forward algorithm
  * ([[graft.api.Graph.triangleNodeCounts]]): the built-in
  * `array_intersect` builds a hash set per row and makes no use of
  * sortedness; at one call per edge that constant factor dominates the
  * whole query. Inputs MUST be sorted ascending and duplicate-free
  * (`sort_array(collect_set(..))` upstream) — outputs are then sorted and
  * duplicate-free too. Behavior on unsorted input is undefined, like any
  * merge intersection.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    val out = new Array[Long](math.min(xs.length, ys.length))
    var i = 0; var j = 0; var n = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) < ys(j)) i += 1
      else if (xs(i) > ys(j)) j += 1
      else { out(n) = xs(i); n += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |long[] $out = new long[Math.min($xs.length, $ys.length)];
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $xs.length && $j < $ys.length) {
         |  if ($xs[$i] < $ys[$j]) $i++;
         |  else if ($xs[$i] > $ys[$j]) $j++;
         |  else { $out[$n++] = $xs[$i]; $i++; $j++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $n));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersect =
    copy(left = l, right = r)
}

object SortedIntersect {
  def sorted_intersect(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
