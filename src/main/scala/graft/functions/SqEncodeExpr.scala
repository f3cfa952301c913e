package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Scalar-quantization encoder: per dimension i,
  * `least(L-1, greatest(0, floor(((x_i - mn_i) * (L-1)) / (mx_i - mn_i))))`
  * with 0 where the corpus range is degenerate (mn = mx) — one compiled
  * pass, replacing an interpreted transform() lambda per dimension per
  * corpus row. Bit-identical to the HOF formulation for every in-corpus
  * vector (pinned corpus-wide in SqSpec), including: NaN floors to
  * code 0 (Scala NaN.toInt = 0 = the SQL cast), a missing or null
  * element yields code 0 (`greatest(0, null)` = 0 in the HOF spec).
  * Two intentional divergences, both edges the HOF got wrong: a
  * far-out-of-range value SATURATES to [0, L-1] (the HOF's clamp sat
  * outside its long→int cast, so encoding a wild new-crawl vector
  * against yesterday's stats crashed with ANSI CAST_OVERFLOW instead
  * of clamping), and a whole-NULL vector yields a NULL code (the HOF
  * built an all-zero phantom code no consumer should score). */
class SqEncodeKernel(minsSeq: Seq[Double], maxsSeq: Seq[Double],
                     levels: Int) extends Serializable {
  // Seq at the expression layer (value equality -> canonicalization /
  // CSE / exchange reuse work); arrays only inside the hot loop
  @transient private lazy val mins: Array[Double] = minsSeq.toArray
  @transient private lazy val maxs: Array[Double] = maxsSeq.toArray
  def encode(vec: ArrayData): ArrayData = {
    val d = mins.length
    val top = (levels - 1).toDouble
    val n = vec.numElements()
    val out = new Array[Int](d)
    var i = 0
    while (i < d) {
      val mn = mins(i)
      val mx = maxs(i)
      out(i) =
        if (mx == mn || i >= n || vec.isNullAt(i)) 0
        else {
          val x = vec.getDouble(i)
          val idx = math.floor(((x - mn) * top) / (mx - mn)).toInt
          math.min(levels - 1, math.max(0, idx))
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}

// mins/maxs are Seq (not Array) so two SqEncode nodes over equal stats
// are `equals`/semanticEquals — arrays compare by reference, which
// broke canonicalization and common-subexpression elimination when
// codeColumn was invoked twice with the same corpus stats
case class SqEncode(child: Expression, mins: Seq[Double],
                    maxs: Seq[Double], levels: Int)
    extends UnaryExpression {

  require(mins.length == maxs.length,
    s"mins/maxs length mismatch: ${mins.length} vs ${maxs.length}")
  require(levels >= 2, s"levels must be >= 2: $levels")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sq_encode needs array<double>, got ${other.catalogString}")
    }

  @transient private lazy val kernel =
    new SqEncodeKernel(mins, maxs, levels)

  override def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val k = ctx.addReferenceObj("sqEncodeKernel", kernel,
      classOf[SqEncodeKernel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SqEncode = copy(child = newChild)
}

object SqEncode {
  def apply(vec: Column, mins: Seq[Double], maxs: Seq[Double],
            levels: Int): Column =
    ColumnBridge.column(SqEncode(
      ColumnBridge.expression(vec), mins, maxs, levels))
}
