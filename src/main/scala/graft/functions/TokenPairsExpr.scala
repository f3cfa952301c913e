package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-token-pair kernel: `text → array<struct<w1, w2>>` of the
  * bigram stream, tokenized and paired in ONE byte pass — the native
  * form of
  * `transform(sequence(1, size(ts) - 1), i -> struct(ts[i], ts[i+1]))`
  * over a [[Tokens]] column.
  *
  * Why: the bigram-LM family (bigramLikelihood / Kneser-Ney /
  * collocations) explodes this pair stream and then feeds SEVERAL
  * aggregation branches from it, so Catalyst re-inlines the projected
  * tokens alias into each branch's generate — the round-9 plan scan
  * measured 24 interpreted tokenize instantiations in q_lm_buckets'
  * optimized plan. This kernel makes each instantiation one scan with
  * no intermediate tokens array and no HOF lambda at all.
  *
  * Tokenization contract identical to [[TokensKernel]] (maximal
  * non-`\s` byte runs of `lower(text)`); a document with fewer than two
  * tokens yields an EMPTY array (explode then emits nothing — the same
  * rows the old `filter(size >= 2)` prefilter kept). Equivalence pinned
  * corpus-wide in TextKernelSpec. */
object TokenPairsKernel {
  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  def pairs(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    // size estimate floored at 16, not capped (see TokensKernel note)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](
      math.max(16, n / 5 + 1))
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        if (prev != null)
          out += new GenericInternalRow(Array[Any](prev, tok))
        prev = tok
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class TokenPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_token_pairs"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_token_pairs needs string, got ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    TokenPairsKernel.pairs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenPairsKernel.pairs($s);")
  override protected def withNewChildInternal(newChild: Expression)
      : TokenPairs = copy(child = newChild)
}

object TokenPairs {
  def apply(text: Column): Column =
    ColumnBridge.column(TokenPairs(ColumnBridge.expression(text)))
}
