package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Per-token XXH64 hashes in one pass over the text: tokenize
  * (maximal non-`\s` byte runs of `lower(text)`, the [[TokensKernel]]
  * contract) and hash each token's bytes IN PLACE —
  * `XXH64(token, seed 42)`, bit-identical to the composed
  * `transform(tokens(text), t -> xxhash64(t))` — without materializing
  * the token array or allocating one UTF8String per token. The SimHash
  * feeder: the fingerprint only ever consumes token hashes, so the
  * tokens themselves never need to exist.
  *
  * Why a kernel (tier (b)): the HOF formulation dispatches one
  * interpreted lambda per token corpus-wide AND pays the token-array
  * materialization the lambda immediately reduces away. Parity pinned
  * corpus-wide in TextKernelSpec. */
object HashedTokensKernel {
  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  def hashes(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      math.max(16, n / 5 + 1))
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out += XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class HashedTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_tokens"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hashed_tokens needs string, got ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    HashedTokensKernel.hashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedTokensKernel.hashes($s);")
  override protected def withNewChildInternal(newChild: Expression)
      : HashedTokens = copy(child = newChild)
}

object HashedTokens {
  def apply(text: Column): Column =
    ColumnBridge.column(HashedTokens(ColumnBridge.expression(text)))
}
