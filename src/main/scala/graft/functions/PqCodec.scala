package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization codec (SURVEY.md §8.2 machinery;
  * [[graft.ext.ProductQuant]] operator).
  *
  * Why custom Expressions (preference order (b) of the build brief): the
  * composable formulation builds the per-subspace argmin from M×K
  * zip_with/aggregate lambdas — at K=16 that is 128 interpreted closure
  * chains per row (measured 0.03 M vec/s encode at 1.28 M vectors), and
  * at the K=256 a large corpus needs, a 2 048-branch literal tree drowns
  * Catalyst analysis before a single row executes. Here the codebook is
  * ONE nested-array literal and the M·K·S loop is flat codegen'd Java —
  * the cost model a native engine would give you, inside whole-stage
  * codegen.
  *
  * Summation order inside each subspace distance is index-ascending
  * left-to-right — bit-identical to the zip_with/aggregate fold and to
  * DuckDB's `list_sum` comprehension, so swapping the formulations never
  * moves an oracle hash. Argmin ties keep the FIRST minimal code,
  * matching `array_position(d, array_min(d))` / `list_position`.
  */
object PqUtil {

  /** codes[m] = argmin_k Σ_i (v[m·S+i] − cb[m][k][i])², first-min ties. */
  def encode(v: ArrayData, cb: ArrayData): ArrayData = {
    val m = cb.numElements()
    val out = new Array[Any](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cents = cb.getArray(mi)
      val k = cents.numElements()
      val s = if (k == 0) 0 else cents.getArray(0).numElements()
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val c = cents.getArray(ki)
        var d = 0.0
        var i = 0
        while (i < s) {
          val diff = v.getDouble(off + i) - c.getDouble(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = ki }
        ki += 1
      }
      out(mi) = best
      off += s
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** tabs[m][k] = Σ_i (v[m·S+i] − cb[m][k][i])² — the per-query ADC
    * distance tables.
    */
  def distTables(v: ArrayData, cb: ArrayData): ArrayData = {
    val m = cb.numElements()
    val out = new Array[Any](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cents = cb.getArray(mi)
      val k = cents.numElements()
      val s = if (k == 0) 0 else cents.getArray(0).numElements()
      val row = new Array[Any](k)
      var ki = 0
      while (ki < k) {
        val c = cents.getArray(ki)
        var d = 0.0
        var i = 0
        while (i < s) {
          val diff = v.getDouble(off + i) - c.getDouble(i)
          d += diff * diff
          i += 1
        }
        row(ki) = d
        ki += 1
      }
      out(mi) = new GenericArrayData(row)
      off += s
      mi += 1
    }
    new GenericArrayData(out)
  }
}

sealed trait PqCodecExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, " +
          s"array<array<array<double>>>), got ($l, $r)")
    }
}

/** `pq_encode(vector, codebooks)` → array<int> of M codes. */
case class PqEncode(left: Expression, right: Expression)
    extends PqCodecExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqUtil.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb) => s"graft.functions.PqUtil.encode($v, $cb)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncode = copy(left = newLeft, right = newRight)
}

/** `pq_dist_tables(vector, codebooks)` → array<array<double>> ADC tables. */
case class PqDistTables(left: Expression, right: Expression)
    extends PqCodecExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)

  override def prettyName: String = "pq_dist_tables"

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqUtil.distTables(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb) => s"graft.functions.PqUtil.distTables($v, $cb)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqDistTables =
    copy(left = newLeft, right = newRight)
}
