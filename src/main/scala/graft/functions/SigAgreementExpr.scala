package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Number of positions where two long-array signatures agree — the
  * MinHash verification count, == `size(filter(zip_with(a, b,
  * (x, y) -> x = y), v -> v))` for the equal-length non-null-element
  * signatures the minhash family produces (parity pinned corpus-wide
  * in DedupSpec; on mismatched lengths both forms count agreements
  * over the overlap — zip_with pads with null, null = x is null, and
  * the filter drops nulls).
  *
  * Why a kernel (tier (b)): signature verification runs once per
  * CANDIDATE PAIR, and the HOF form dispatches 2·numHashes
  * interpreted lambdas and materializes two intermediate arrays per
  * pair — at a 128-hash signature that is measurable across the
  * novelty/pair operators' verify joins. */
object SigAgreementKernel {
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_agreement"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_agreement needs two array<bigint>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreementKernel.agree(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigAgreementKernel.agree($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreement(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
