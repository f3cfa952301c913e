package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native LSH band keys over a MinHash signature: band b ∈ [0, bands)
  * gets the key of the composed built-in
  * `xxhash64(b, slice(sig, b*r+1, r))` (r = numHashes/bands),
  * reproduced BIT-FOR-BIT — seed 42, the int band index hashed first,
  * then the band's r signature longs folded through XXH64 in order —
  * so band keys stay stable across the batch index
  * ([[graft.llm.Dedup.minhashBandWinners]] exports them), the
  * streaming NearDupOp state, and the DuckDB oracle's XXH64 replay.
  *
  * Why a custom Expression (tier (b)): the HOF formulation
  * `transform(sequence(0, bands-1), b -> xxhash64(b, slice(sig, ...)))`
  * dispatches `bands` interpreted lambdas per row, each allocating a
  * slice copy of the signature — on the minhash family's profile that
  * is the last interpreted step left between the native signature
  * kernel and the banding Exchange. This compiles to one primitive
  * loop over the signature with no allocation beyond the output array.
  *
  * A signature with fewer than numHashes elements yields an EMPTY
  * array (the `when(size(sig) >= numHashes)` guard of the HOF form):
  * sentinel/short-doc signatures never produce content bands. Null
  * signature elements are skipped exactly like the built-in XxHash64
  * (hash carries through unchanged); MinHash signatures are
  * containsNull=false so the branch is dead in practice. */
case class BandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  require(bands > 0 && numHashes > 0 && numHashes % bands == 0,
    "bands must divide numHashes")

  private val r = numHashes / bands

  override def prettyName: String = "graft_band_keys"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_keys needs array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    if (sig.numElements() < numHashes)
      new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        // xxhash64(b, slice): int index, then the r longs, folded
        // left-to-right with the running hash as the seed (seed 42)
        var h = XXH64.hashInt(b, 42L)
        var i = b * r
        val end = i + r
        while (i < end) {
          if (!sig.isNullAt(i)) h = XXH64.hashLong(sig.getLong(i), h)
          i += 1
        }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, sig => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val h = ctx.freshName("h")
      s"""
         |long[] $out;
         |if ($sig.numElements() < $numHashes) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $h = $xxh.hashInt($b, 42L);
         |    int $i = $b * $r;
         |    int $end = $i + $r;
         |    for (; $i < $end; $i++) {
         |      if (!$sig.isNullAt($i)) {
         |        $h = $xxh.hashLong($sig.getLong($i), $h);
         |      }
         |    }
         |    $out[$b] = $h;
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BandKeys = copy(child = newChild)
}

object BandKeys {
  def apply(sig: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(
      BandKeys(ColumnBridge.expression(sig), numHashes, bands))
}
