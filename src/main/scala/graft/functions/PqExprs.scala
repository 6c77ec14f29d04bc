package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, IntegerType}

/** Product-quantization distance/assignment expressions.
  *
  * Decimal-exact PQ needs `(CAST(x AS DECIMAL(12,6)) − c)²` summed per
  * subspace. Spelled as literal expression trees that is 16 × k decimal
  * terms per subspace — and because each Lloyd round bakes NEW centroid
  * literals into the tree, every round recompiles a giant generated
  * class (measured: the janino time dwarfed the 2000-row data work).
  * These expressions keep the centroids as REFERENCE arrays instead:
  * the generated source is identical across rounds (janino cache hit,
  * one compiled class ever), and the arithmetic runs in unscaled long
  * micro-units — exactly the decimal values, since a DECIMAL(12,6) IS
  * its unscaled 10⁻⁶ integer.
  *
  * Rounding parity: doubles convert to micros via
  * `BigDecimal.valueOf(x).setScale(6, HALF_UP)` — the same path Spark's
  * `Cast(DoubleType → DecimalType)` takes, so results are bit-identical
  * to the literal-decimal formulation the DuckDB oracle replays.
  * Overflow bound: the subspace sum needs subDim · (2·|x|ₘₐₓ·10⁶)² < 2⁶³,
  * i.e. |x|ₘₐₓ ≲ 10³ at subDim ≤ 64 — embeddings are unit-scale
  * (|x| < 1 ⇒ d² ≤ 6·10¹², ×64 ≪ 2⁶³), with 1000× headroom.
  */
object PqMicro {

  def micros(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def toMicros(cents: Array[Array[Double]]): Array[Array[Long]] =
    cents.map(_.map(micros))

  /** The vector slice [off, off+len) as micros — converted ONCE per row,
    * then reused against every codebook cell: the BigDecimal conversion
    * dominates when repeated per cell (m·k·subDim conversions/row at the
    * scale-adaptive k ≈ √N; slicing first makes it m·subDim). */
  def microsSlice(v: ArrayData, off: Int, len: Int): Array[Long] = {
    val out = new Array[Long](len)
    var i = 0
    while (i < len) { out(i) = micros(v.getDouble(off + i)); i += 1 }
    out
  }

  /** Σ (vm_i − c_i)² over pre-converted micros, unscaled at 10⁻¹². */
  def dist2Micros(vm: Array[Long], cent: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(vm.length, cent.length)
    while (i < n) {
      val d = vm(i) - cent(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Σ (x_i − c_i)² over the subspace, unscaled at 10⁻¹². */
  def dist2Unscaled(v: ArrayData, off: Int, cent: Array[Long]): Long =
    dist2Micros(microsSlice(v, off, cent.length), cent)

  /** All (sub, cell, d2) LUT rows for one query vector — referenced from
    * [[graft.functions.PqLut]]'s generated code. */
  def lutRows(v: ArrayData, books: Array[Array[Array[Long]]],
      subDim: Int): ArrayData = {
    var n = 0
    var s = 0
    while (s < books.length) { n += books(s).length; s += 1 }
    val out = new Array[Any](n)
    var i = 0
    s = 0
    while (s < books.length) {
      val vm = if (books(s).isEmpty) Array.emptyLongArray
        else microsSlice(v, s * subDim, subDim)
      var c = 0
      while (c < books(s).length) {
        out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](s, c,
            org.apache.spark.sql.types.Decimal(
              dist2Micros(vm, books(s)(c)), 38, 12)))
        i += 1
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Argmin cell over all centroids (ties → lowest cell id). */
  def argmin(v: ArrayData, off: Int, cents: Array[Array[Long]]): Int = {
    if (cents.isEmpty) return 0
    val vm = microsSlice(v, off, cents(0).length)
    var best = 0
    var bestD = Long.MaxValue
    var k = 0
    while (k < cents.length) {
      val d = dist2Micros(vm, cents(k))
      if (d < bestD) { bestD = d; best = k }
      k += 1
    }
    best
  }
}

/** Exact squared L2 between a vector's subspace slice and one centroid,
  * as DECIMAL(38,12) — value-identical to the literal-decimal tree. */
case class PqDist2(child: Expression, centMicros: Array[Long], offset: Int)
    extends UnaryExpression {

  override def dataType: DataType = DecimalType(38, 12)
  override def prettyName: String = "pq_dist2"

  override def nullSafeEval(v: Any): Any =
    Decimal(PqMicro.dist2Unscaled(v.asInstanceOf[ArrayData], offset, centMicros), 38, 12)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.addReferenceObj("pqCent", centMicros, "long[]")
      s"""${ev.value} = org.apache.spark.sql.types.Decimal.apply(
         |  graft.functions.PqMicro.dist2Unscaled($v, $offset, $c), 38, 12);""".stripMargin
    })

  // content-based equality (Array fields are reference-equal by default):
  // keeps canonicalization and codegen-class reuse working across
  // semantically identical instances
  override def equals(other: Any): Boolean = other match {
    case o: PqDist2 =>
      child == o.child && offset == o.offset &&
        java.util.Arrays.equals(centMicros, o.centMicros)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(offset),
    Integer.valueOf(java.util.Arrays.hashCode(centMicros)))

  override protected def withNewChildInternal(c: Expression): PqDist2 =
    copy(child = c)
}

/** Argmin centroid for one subspace — the PQ code, a narrow projection. */
case class PqArgmin(child: Expression, centsMicros: Array[Array[Long]], offset: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_argmin"

  override def nullSafeEval(v: Any): Any =
    PqMicro.argmin(v.asInstanceOf[ArrayData], offset, centsMicros)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.addReferenceObj("pqCents", centsMicros, "long[][]")
      s"${ev.value} = graft.functions.PqMicro.argmin($v, $offset, $c);"
    })

  override def equals(other: Any): Boolean = other match {
    case o: PqArgmin =>
      child == o.child && offset == o.offset &&
        java.util.Arrays.deepEquals(
          centsMicros.asInstanceOf[Array[AnyRef]],
          o.centsMicros.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(offset),
    Integer.valueOf(java.util.Arrays.deepHashCode(
      centsMicros.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): PqArgmin =
    copy(child = c)
}

/** Whole ADC lookup table for one query vector: (sub, cell, d2) for every
  * codebook cell of every subspace — one expression carrying the books by
  * REFERENCE. The literal formulation (explode of an m×k array of
  * [[PqDist2]] structs) generated a class whose size grows with the
  * scale-adaptive codebook (m×k ≈ 352 entries at sf0.1, ~1100 at the
  * derived sf1) and recompiles whenever the model moves; this stays one
  * small class at any k. Values are identical: the same
  * [[PqMicro.dist2Unscaled]] micro arithmetic per (sub, cell). */
case class PqLut(child: Expression, booksMicros: Array[Array[Array[Long]]],
    subDim: Int) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cell", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("d2", DecimalType(38, 12), nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(v: Any): Any =
    PqMicro.lutRows(v.asInstanceOf[ArrayData], booksMicros, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("pqBooks", booksMicros, "long[][][]")
      s"${ev.value} = graft.functions.PqMicro.lutRows($v, $b, $subDim);"
    })

  override def equals(other: Any): Boolean = other match {
    case o: PqLut =>
      child == o.child && subDim == o.subDim &&
        java.util.Arrays.deepEquals(
          booksMicros.asInstanceOf[Array[AnyRef]],
          o.booksMicros.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(subDim),
    Integer.valueOf(java.util.Arrays.deepHashCode(
      booksMicros.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}

object PqExprs {
  def pq_dist2(v: Column, cent: Array[Double], offset: Int): Column =
    ColumnBridge.column(PqDist2(ColumnBridge.expression(v), PqMicro.toMicros(Array(cent))(0), offset))

  def pq_argmin(v: Column, cents: Array[Array[Double]], offset: Int): Column =
    ColumnBridge.column(PqArgmin(ColumnBridge.expression(v), PqMicro.toMicros(cents), offset))

  def pq_lut(v: Column, books: Array[Array[Array[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(v),
      books.map(PqMicro.toMicros), subDim))
}
