package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** POSITIONAL n-gram hash sequence: tokens array → one xxhash64 per gram
  * position, duplicates KEPT (element i is the hash of the space-joined
  * gram starting at token i). The positional twin of [[ShingleHashes]]
  * (which dedups for set semantics) — duplicate-span detection and other
  * alignment consumers need the position axis.
  *
  * Same hashing as [[ShingleHashesKernel.positionalHashes]] (XXH64 seed 42
  * over the UTF-8 bytes of the joined gram, null tokens skipped like
  * `array_join`), one compiled pass per row. */
case class PosShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pos_shingle_hashes needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashesKernel.positionalHashes(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val kernel = ctx.addReferenceObj("shingleKernel", ShingleHashesKernel,
      ShingleHashesKernel.getClass.getName)
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, ts =>
      s"${ev.value} = new $gad($kernel.positionalHashes($ts, $n));")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PosShingleHashes = copy(child = newChild)
}

object PosShingleHashes {
  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(
      PosShingleHashes(ColumnBridge.expression(tokens), n))
}
