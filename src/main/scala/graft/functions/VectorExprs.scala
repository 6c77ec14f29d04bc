package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `ARRAY<DOUBLE>` columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, (x, y) => x * y), ...)` —
  * evaluates the lambda per element through interpreted
  * `HigherOrderFunction` machinery and allocates an intermediate array per
  * row; at 100 TB the similarity operators spend all their time there. This
  * expression compiles to a tight primitive loop inside whole-stage codegen
  * (SURVEY.md §4, deferred-optimization (b), now needed by the bench).
  *
  * Summation is strict left-to-right, matching both the higher-order
  * fallback and DuckDB's `list_reduce` fold — results are bit-identical, so
  * the DuckDB oracles hold unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i) * ys(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $xs[$i] * $ys[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorExprs {
  import org.apache.spark.sql.graft.ColumnBridge

  /** `dot_product(a, b)` as a Column (inputs: ARRAY<DOUBLE>). */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm via the codegen'd dot product. */
  def l2_norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot_product(v, v))
}
