package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** IVF coarse-quantizer assignment/probing expressions.
  *
  * The literal formulation — `greatest(struct(dot(v, array(lit…)) /
  * (nrm · cn), -i), …)` — bakes every centroid component into the
  * expression tree: at the scale-adaptive cell counts (nCells ≈ √N, up to
  * 128) that is ~8k literals per assignment, and each Lloyd round bakes
  * NEW literals, so every round recompiles a giant generated class (the
  * same janino pathology [[PqMicro]] documents for the PQ fit). These
  * expressions carry the centroids as REFERENCE arrays instead: one
  * generated class ever, O(1) plan size in nCells.
  *
  * Arithmetic parity (the oracle replays this bit-for-bit): per cell,
  * cos = dot(v, cent) / (nrm · ‖cent‖) with the dot as the strict
  * left-to-right fold of [[DotProduct]] and the centroid norm computed
  * HOST-side by the same fold (`√(Σ cᵢ²)`); selection is max by
  * `Double.compare` (NaN greatest, −0.0 < 0.0 — Spark's DoubleType
  * ordering and DuckDB's `ORDER BY cos DESC`), ties → lowest cell id.
  */
object IvfCos {

  /** Host-side centroid norms with the [[DotProduct]] fold order. */
  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  private def cosAt(xs: Array[Double], nrm: Double,
      cent: Array[Double], cn: Double): Double = {
    val n = math.min(xs.length, cent.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i) * cent(i); i += 1 }
    s / (nrm * cn)
  }

  /** Argmax-cosine cell (ties → lowest cell id; caller guards length ≥ 1). */
  def bestCell(v: ArrayData, nrm: Double,
      cents: Array[Array[Double]], cn: Array[Double]): Int = {
    val xs = v.toDoubleArray()
    var best = 0
    var bestCos = cosAt(xs, nrm, cents(0), cn(0))
    var k = 1
    while (k < cents.length) {
      val c = cosAt(xs, nrm, cents(k), cn(k))
      if (java.lang.Double.compare(c, bestCos) > 0) { best = k; bestCos = c }
      k += 1
    }
    best
  }

  /** Top-`nprobe` cells by cosine (desc, ties → lowest cell id), as the
    * probe list. Selection over ≤ nCells candidates — model-sized. */
  def topCells(v: ArrayData, nrm: Double,
      cents: Array[Array[Double]], cn: Array[Double], nprobe: Int): ArrayData = {
    val xs = v.toDoubleArray()
    val cos = new Array[Double](cents.length)
    var i = 0
    while (i < cents.length) { cos(i) = cosAt(xs, nrm, cents(i), cn(i)); i += 1 }
    val m = math.min(nprobe, cents.length)
    val out = new Array[Any](m)
    val taken = new Array[Boolean](cents.length)
    var j = 0
    while (j < m) {
      var best = -1
      var k = 0
      while (k < cents.length) {
        if (!taken(k) && (best < 0 || java.lang.Double.compare(cos(k), cos(best)) > 0))
          best = k
        k += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** The centroid model as ONE torrent-broadcast value: centroids plus
  * their host-side [[IvfCos.norms]], so both broadcast-gear expressions
  * score with exactly the arithmetic of the reference-carrying gear. */
final case class IvfModel(cents: Array[Array[Double]], norms: Array[Double])

/** Per-vector IVF cell id: `argmax_cell cos(v, cent_cell)`. */
case class IvfArgmax(left: Expression, right: Expression,
    cents: Array[Array[Double]], centNorms: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_argmax"

  override def nullSafeEval(v: Any, n: Any): Any =
    IvfCos.bestCell(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      cents, centNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val c = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val cn = ctx.addReferenceObj("ivfNorms", centNorms, "double[]")
      s"${ev.value} = graft.functions.IvfCos.bestCell($v, $n, $c, $cn);"
    })

  // content-based equality (Array fields are reference-equal by default):
  // keeps canonicalization and codegen-class reuse working
  override def equals(other: Any): Boolean = other match {
    case o: IvfArgmax =>
      left == o.left && right == o.right &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], o.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, left, right,
    Integer.valueOf(java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfArgmax =
    copy(left = l, right = r)
}

/** Per-query probe list: the `nprobe` highest-cosine cells. */
case class IvfTopCells(left: Expression, right: Expression,
    cents: Array[Array[Double]], centNorms: Array[Double], nprobe: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_top_cells"

  override def nullSafeEval(v: Any, n: Any): Any =
    IvfCos.topCells(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      cents, centNorms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val c = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val cn = ctx.addReferenceObj("ivfNorms", centNorms, "double[]")
      s"""${ev.value} = graft.functions.IvfCos.topCells($v, $n, $c, $cn, $nprobe);"""
    })

  override def equals(other: Any): Boolean = other match {
    case o: IvfTopCells =>
      left == o.left && right == o.right && nprobe == o.nprobe &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], o.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, left, right, Integer.valueOf(nprobe),
    Integer.valueOf(java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfTopCells =
    copy(left = l, right = r)
}

/** [[IvfArgmax]] with the model behind a [[Broadcast]] HANDLE instead of
  * an in-plan reference array — the above-budget gear. The plan (and so
  * every serialized task binary) carries only the handle; the centroid
  * blocks move ONCE per executor via torrent broadcast and are read from
  * the executor-local block manager afterwards. Identical arithmetic and
  * tie rule to [[IvfArgmax]] — same [[IvfCos.bestCell]] loop, same
  * zero-exchange codegen'd projection — so assignments are equal
  * bit-for-bit at any model size (ApiSpec pins it). */
case class IvfArgmaxBc(left: Expression, right: Expression,
    model: Broadcast[IvfModel]) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_argmax_bc"

  override def nullSafeEval(v: Any, n: Any): Any = {
    val m = model.value
    IvfCos.bestCell(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      m.cents, m.norms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val bc = ctx.addReferenceObj("ivfModelBc", model,
        "org.apache.spark.broadcast.Broadcast")
      // resolve the broadcast once per generated-class instance, not per
      // row: .value() is a block-manager lookup behind a lock
      val m = ctx.addMutableState("graft.functions.IvfModel", "ivfModel")
      s"""
         |if ($m == null) $m = (graft.functions.IvfModel) $bc.value();
         |${ev.value} = graft.functions.IvfCos.bestCell($v, $n, $m.cents(), $m.norms());
       """.stripMargin
    })

  // the model compares by REFERENCE identity of the Broadcast handle:
  // broadcast ids restart at 0 per SparkContext, so id-only equality
  // would conflate same-id handles from different contexts. modelBroadcast
  // caches per (array-identity, context), so equal plans share the one
  // handle object and canonicalization / codegen-class reuse still work.
  override def equals(other: Any): Boolean = other match {
    case o: IvfArgmaxBc =>
      left == o.left && right == o.right && (model eq o.model)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, left, right, Integer.valueOf(System.identityHashCode(model)))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfArgmaxBc =
    copy(left = l, right = r)
}

/** [[IvfTopCells]] behind a broadcast model handle — see [[IvfArgmaxBc]]. */
case class IvfTopCellsBc(left: Expression, right: Expression,
    model: Broadcast[IvfModel], nprobe: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_top_cells_bc"

  override def nullSafeEval(v: Any, n: Any): Any = {
    val m = model.value
    IvfCos.topCells(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      m.cents, m.norms, nprobe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val bc = ctx.addReferenceObj("ivfModelBc", model,
        "org.apache.spark.broadcast.Broadcast")
      val m = ctx.addMutableState("graft.functions.IvfModel", "ivfModel")
      s"""
         |if ($m == null) $m = (graft.functions.IvfModel) $bc.value();
         |${ev.value} = graft.functions.IvfCos.topCells($v, $n, $m.cents(), $m.norms(), $nprobe);
       """.stripMargin
    })

  // reference-identity model comparison — see [[IvfArgmaxBc.equals]]
  override def equals(other: Any): Boolean = other match {
    case o: IvfTopCellsBc =>
      left == o.left && right == o.right && nprobe == o.nprobe &&
        (model eq o.model)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, left, right, Integer.valueOf(nprobe),
    Integer.valueOf(System.identityHashCode(model)))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfTopCellsBc =
    copy(left = l, right = r)
}

object IvfExprs {
  def ivf_argmax(v: Column, nrm: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(IvfArgmax(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm),
      cents, IvfCos.norms(cents)))

  def ivf_top_cells(v: Column, nrm: Column, cents: Array[Array[Double]],
      nprobe: Int): Column =
    ColumnBridge.column(IvfTopCells(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm),
      cents, IvfCos.norms(cents), nprobe))

  def ivf_argmax_bc(v: Column, nrm: Column, model: Broadcast[IvfModel]): Column =
    ColumnBridge.column(IvfArgmaxBc(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm), model))

  def ivf_top_cells_bc(v: Column, nrm: Column, model: Broadcast[IvfModel],
      nprobe: Int): Column =
    ColumnBridge.column(IvfTopCellsBc(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm), model, nprobe))
}
