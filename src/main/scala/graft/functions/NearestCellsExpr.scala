package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Serializable centroid table + nearest-cell kernel for [[NearestCells]]:
  * squared-L2 distance to every centroid in one primitive pass, then the
  * `nProbe` nearest cell indices ascending by (distance, index) — the tie
  * rule of the HOF formulation it replaced (array_position picks the first
  * index achieving the min). */
final class CentroidTable(val centroids: Seq[Seq[Double]])
    extends Serializable {
  @transient private lazy val m: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  def nearest(vec: ArrayData, nProbe: Int, isFloat: Boolean): ArrayData = {
    val k = m.length
    // dimension mismatch must be LOUD: a min()-truncated distance fold
    // would return confidently wrong cell assignments (stale centroid
    // fixture vs re-projected vectors) — the PqResidualCodes rule
    if (k > 0 && vec.numElements() != m(0).length)
      throw new IllegalArgumentException(
        s"nearest_cells: vector dim ${vec.numElements()} != centroid " +
          s"dim ${m(0).length} — quantizer trained on different vectors?")
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = m(c)
      val n = math.min(vec.numElements(), cent.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val diff = x - cent(i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    // selection of nProbe smallest by (dist, idx): k is small (a coarse
    // quantizer has 10²–10⁴ cells), repeated argmin is cache-friendly
    val p = math.min(nProbe, k)
    val out = new Array[Int](p)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < p) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && dists(i) < bestD) { bestD = dists(i); best = i }
        i += 1
      }
      if (best < 0) {
        // all remaining distances are NaN (NaN component in the vector or
        // a centroid): fall back to the lowest untaken index rather than
        // crashing the query on one bad embedding row
        var i2 = 0
        while (best < 0 && i2 < k) { if (!taken(i2)) best = i2; i2 += 1 }
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native nearest-centroid probe for IVF ANN: the `nProbe` nearest cell
  * indices of the input vector by L2, as array<int>.
  *
  * The HOF formulation (transform over a typedlit centroid matrix +
  * interpreted l2Dist fold per centroid, then array_sort of structs) ran
  * k interpreted lambda folds per ROW; this is one compiled pass with the
  * centroid table riding the plan as a reference object — the same
  * "broadcast with the task binaries" property, none of the lambda
  * dispatch. */
case class NearestCells(child: Expression, table: CentroidTable,
                        nProbe: Int) extends UnaryExpression {

  require(nProbe >= 1, "nProbe must be >= 1")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells needs array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    table.nearest(input.asInstanceOf[ArrayData], nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", table,
      classOf[CentroidTable].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.nearest($v, $nProbe, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCells = copy(child = newChild)
}

object NearestCells {
  def apply(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    ColumnBridge.column(NearestCells(
      ColumnBridge.expression(vec), new CentroidTable(centroids), nProbe))
}
