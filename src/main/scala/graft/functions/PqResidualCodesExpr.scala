package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused IVF-PQ residual encoder: subtract the coarse centroid of
  * `cell` from the vector and take each subspace's nearest-codeword
  * index, all in ONE pass — the per-row encode of
  * `Pq.ivfAdcTopKResidual`.
  *
  * == the composed `codeColumn(residualColumn(vec, coarse, cell), cb)`
  * (parity pinned in PqDsirSpec): same IEEE subtraction, same
  * ascending-dimension squared-L2 fold as [[CentroidTable.nearest]],
  * same (distance, index) tie rule, same all-NaN → index 0 fallback.
  * The composed form was CollapseProject-inlined into every subspace
  * slice, so the INTERPRETED zip_with residual re-evaluated m times
  * per row (m=8 instantiations observed in q_pq_ivf_residual's
  * optimized plan). */
final class PqResidualCodesKernel(coarse: Seq[Seq[Double]],
                                  books: Seq[Seq[Seq[Double]]],
                                  subDim: Int) extends Serializable {
  @transient private lazy val cents: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val bk: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  def codes(vec: ArrayData, cell: Int, isFloat: Boolean): ArrayData = {
    // malformed inputs (a cell that is not a KMeans.cellOf output, or a
    // vector narrower than the codebook span) fail LOUDLY with the
    // offending values — a clamp here would silently truncate the
    // distance fold and return plausible-but-wrong codes
    if (cell < 0 || cell >= cents.length)
      throw new IllegalArgumentException(
        s"graft_pq_residual_codes: cell $cell out of range " +
          s"[0, ${cents.length})")
    val cent = cents(cell)
    val m = bk.length
    val out = new Array[Int](m)
    val n = vec.numElements()
    if (n < m * subDim || cent.length < m * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_residual_codes: need >= ${m * subDim} dims " +
          s"(m=$m x subDim=$subDim), got vector=$n, " +
          s"centroid=${cent.length}")
    var s = 0
    while (s < m) {
      val base = s * subDim
      val cwords = bk(s)
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cwords.length) {
        val w = cwords(c)
        var d = 0.0
        var i = 0
        val lim = math.min(subDim, w.length)
        while (i < lim) {
          val x = if (isFloat) vec.getFloat(base + i).toDouble
                  else vec.getDouble(base + i)
          val diff = (x - cent(base + i)) - w(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = if (best < 0) 0 else best
      s += 1
    }
    new GenericArrayData(out)
  }
}

case class PqResidualCodes(left: Expression, right: Expression,
                           coarse: Seq[Seq[Double]],
                           books: Seq[Seq[Seq[Double]]], subDim: Int)
    extends BinaryExpression {

  require(subDim >= 1, s"subDim must be >= 1: $subDim")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_residual_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_residual_codes needs (array<float|double>, int), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  @transient private lazy val kernel =
    new PqResidualCodesKernel(coarse, books, subDim)

  private def floatIn: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    kernel.codes(v.asInstanceOf[ArrayData],
      c.asInstanceOf[Int], floatIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val k = ctx.addReferenceObj("pqResidualKernel", kernel,
      classOf[PqResidualCodesKernel].getName)
    val f = floatIn.toString
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $k.codes($v, $c, $f);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualCodes =
    copy(left = newLeft, right = newRight)
}

object PqResidualCodes {
  def apply(vec: Column, cell: Column, coarse: Seq[Seq[Double]],
            books: Seq[Seq[Seq[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqResidualCodes(
      ColumnBridge.expression(vec), ColumnBridge.expression(cell),
      coarse, books, subDim))
}
