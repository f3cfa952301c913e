package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance (ADC) lookup sum: Σ_j dtab(j)(code(j)), folded
  * left-to-right — the scoring inner loop of the PQ/SQ search family.
  * Bit-identical to the HOF fold
  * `aggregate(sequence(0, m-1), 0.0, (acc, j) ->
  *   acc + element_at(element_at(dtab, j+1), element_at(code, j+1) + 1))`
  * where m is the distance-table length, including null semantics (a
  * code SHORTER than dtab nulls the sum — the HOF's fixed-m fold hit
  * an out-of-range element_at there — as does any out-of-range lookup
  * or null element, exactly like element_at) and IEEE order (one
  * left-to-right add chain — the SQL oracle replays the same fold).
  * One intentional strictness divergence: a code LONGER than dtab also
  * nulls the sum, where the fixed-m HOF fold would silently ignore the
  * trailing code entries — a longer code is always a caller bug
  * (unreachable in the shipped PQ/SQ pipelines, which build both
  * arrays from the same m), so failing loud beats a partial answer.
  *
  * Why a kernel (tier (b)): the fold runs once per (query, candidate)
  * pair with m interpreted lambda dispatches each; this is the entire
  * post-encode cost of ADC search. */
object AdcSumKernel {
  // null-marker: ADC sums are finite (distance-table entries), so the
  // eval wrapper maps NaN-from-null to SQL NULL via the boxed path
  def sum(dtab: ArrayData, code: ArrayData): Any = {
    val m = code.numElements()
    // the HOF folds over the CODEBOOK's m: a code shorter than dtab
    // must null the sum (element_at out-of-range), not partial-sum
    if (m != dtab.numElements()) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (code.isNullAt(j) || dtab.isNullAt(j)) return null
      val row = dtab.getArray(j)
      val idx = code.getInt(j)
      if (idx < 0 || idx >= row.numElements() || row.isNullAt(idx))
        return null
      acc += row.getDouble(idx)
      j += 1
    }
    acc
  }
}

case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_sum"
  // an in-range lookup chain never nulls, but out-of-range element_at
  // semantics can — the result is nullable even for non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_adc_sum needs (array<array<double>>, array<int>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    AdcSumKernel.sum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = graft.functions.AdcSumKernel.sum($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) r).doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcSum {
  def apply(dtab: Column, code: Column): Column =
    ColumnBridge.column(AdcSum(
      ColumnBridge.expression(dtab), ColumnBridge.expression(code)))
}
