package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace tokenizer kernel — the native form of
  * `filter(split(lower(trim(text)), "\\s+"), len > 0)`.
  *
  * Why: tokenization is the root of nearly every text-battery
  * expression chain, and the declarative form is TWO CodegenFallback
  * higher-order passes (split builds an array with empty strings, the
  * filter HOF walks it interpreted) — which Catalyst then re-inlines
  * into every pushed predicate and collapsed projection that references
  * the tokens column (a round-8/9 plan audit measured up to 40
  * instantiations in one optimized plan). A duplicated instantiation of
  * THIS kernel is one allocation-light byte scan instead.
  *
  * Exact-equivalence contract (pinned corpus-wide + edge strings in
  * TextKernelSpec): tokens are maximal runs of non-`\s` bytes of
  * `lower(text)` (UTF8String.toLowerCase — the same lowering `lower()`
  * uses; Java regex `\s` = the six ASCII whitespace chars, which in
  * UTF-8 occur only as standalone bytes, so the byte scan is exact for
  * ANY UTF-8 input). `trim` in the declarative form only strips the
  * 0x20 runs the split discards anyway. Output element type matches
  * the declarative form: array<string> containsNull=false. */
object TokensKernel {
  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  def tokens(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    // pre-size to the ~5-bytes-per-token estimate (floored at 16 so
    // tiny docs don't allocate a zero-capacity buffer); min() here
    // would CAP the capacity at 16 and regrow ~10x on a 10k-token doc
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](
      math.max(16, n / 5 + 1))
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, start, i - start)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class Tokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_tokens needs string, got ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    TokensKernel.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokensKernel.tokens($s);")
  override protected def withNewChildInternal(newChild: Expression)
      : Tokens = copy(child = newChild)
}

object Tokens {
  def apply(text: Column): Column =
    ColumnBridge.column(Tokens(ColumnBridge.expression(text)))
}
