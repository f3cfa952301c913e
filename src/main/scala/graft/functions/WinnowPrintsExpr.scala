package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Kernel for [[WinnowPrints]]: tokens → winnowed fingerprint selection
  * in one compiled O(tokens) pass. The sliding-window minimum uses the
  * monotonic-deque algorithm from the winnowing paper (Schleimer,
  * Wilkerson & Aiken, SIGMOD'03 §5 "implementation"): each gram hash is
  * pushed/popped at most once, so selecting the min of every w-window
  * is O(n) total, not O(n·w). Serializable singleton so codegen can
  * hold it as a reference object. */
object WinnowKernel extends Serializable {

  def compute(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val grams = ShingleHashesKernel.positionalHashes(tokens, k)
    val n = grams.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < w) { // degenerate doc: one print, the global min
      var min = grams(0)
      var i = 1
      while (i < n) { if (grams(i) < min) min = grams(i); i += 1 }
      return new GenericArrayData(Array(min))
    }
    val nWin = n - w + 1
    val out = new Array[Long](nWin)
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    var outLen = 0
    // monotonic deque of gram indices with strictly increasing hashes;
    // front = index of the current window's minimum
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // deque is dq[head, tail)
    var i = 0
    while (i < n) {
      while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = grams(dq(head))
        if (seen.add(m)) { out(outLen) = m; outLen += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }
}

/** Native winnowing fingerprint selection: tokens array → distinct
  * window-minimum xxhash64 k-gram hashes, first-occurrence order.
  *
  * Output-identical to the HOF formulation it replaces
  * (`array_distinct(transform(sequence(...), i ->
  * array_min(slice(grams, i, w))))` over
  * `Text.shinglesFromTokens` hashes — pinned by WinnowSpec parity):
  * a window's minimum is a value, not a position, so deque tie-breaking
  * cannot diverge from `array_min`, and both sides dedup by value
  * keeping first occurrence. The HOF chain re-sliced and re-scanned w
  * grams per window through interpreted lambdas — O(n·w) with an
  * allocation per window, 13.5 s for q_winnow at sf0.1; this kernel is
  * the paper's O(n) loop in one codegen'd call. */
case class WinnowPrints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, "gram size k must be >= 1")
  require(w >= 1, "window size w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_prints needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val kernel = ctx.addReferenceObj("winnowKernel", WinnowKernel,
      WinnowKernel.getClass.getName)
    nullSafeCodeGen(ctx, ev, ts =>
      s"${ev.value} = $kernel.compute($ts, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowPrints = copy(child = newChild)
}

object WinnowPrints {
  def apply(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(
      WinnowPrints(ColumnBridge.expression(tokens), k, w))
}
