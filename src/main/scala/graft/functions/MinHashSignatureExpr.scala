package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a shingle-hash array: for hash function
  * k ∈ [0, numHashes), emits min over the input longs of
  * XXH64.hashLong(h, seed = k).
  *
  * Why a custom Expression (tier (b)): the HOF formulation
  * `transform(sequence(0, n-1), k -> array_min(transform(hs, h ->
  * xxhash64(k, h))))` dispatches numHashes × |hs| interpreted lambdas per
  * row — the dominant cost of MinHash at corpus scale. This compiles to a
  * nested primitive loop (numHashes × |hs| static hash calls, no
  * allocation beyond the output array).
  *
  * Null elements are skipped; an all-null/empty input yields
  * Long.MaxValue sentinels (no shingles → no collisions, since bucket
  * keys hash the whole band).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!hs.isNullAt(i)) {
          val h = XXH64.hashLong(hs.getLong(i), k)
          if (h < min) min = h
        }
        i += 1
      }
      out(k) = min
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val min = ctx.freshName("min")
      val h = ctx.freshName("h")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$numHashes];
         |for (int $k = 0; $k < $numHashes; $k++) {
         |  long $min = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$hs.isNullAt($i)) {
         |      long $h = $xxh.hashLong($hs.getLong($i), (long) $k);
         |      if ($h < $min) $min = $h;
         |    }
         |  }
         |  $out[$k] = $min;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  def apply(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(hashes), numHashes))
}
