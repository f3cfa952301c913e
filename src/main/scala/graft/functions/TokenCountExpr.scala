package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count without tokenization: the number of maximal non-`\s`
  * byte runs, scanned over the RAW text bytes — zero allocation (no
  * lowercased copy, no token array, no UTF8String slices).
  *
  * Equals `size(Text.tokens(text))` exactly: tokens are runs of
  * non-whitespace bytes of `lower(text)`, and lowercasing never
  * creates or removes a whitespace BOUNDARY — the six ASCII `\s` bytes
  * are fixed points of toLowerCase, no uppercase codepoint lowers to
  * whitespace, and multi-byte expansions (e.g. İ → i + combining dot)
  * stay inside their run — so the count is invariant under the
  * lowering the token kernel applies. Parity pinned corpus-wide in
  * TextKernelSpec.
  *
  * Why a kernel (tier (b)): length stats run corpus-wide in every
  * quality/profile/BM25 pass; `size(tokens(text))` pays the full
  * tokenize (lowercase copy + one UTF8String per token) just to throw
  * the array away. */
object TokenCountKernel {
  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  def count(text: UTF8String): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    var c = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        c += 1
        while (i < n && !isWs(bytes(i))) i += 1
      }
    }
    c
  }
}

case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_count needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenCountKernel.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.TokenCountKernel.count($text);")

  override protected def withNewChildInternal(newChild: Expression)
      : TokenCount = copy(child = newChild)
}

object TokenCount {
  def apply(text: Column): Column =
    ColumnBridge.column(TokenCount(ColumnBridge.expression(text)))
}
