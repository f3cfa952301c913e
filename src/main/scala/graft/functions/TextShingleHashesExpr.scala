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

/** Fused text → distinct word-n-gram shingle hashes: tokenize (the
  * [[TokensKernel]] contract — maximal non-`\s` byte runs of
  * `lower(text)`) and hash every n-gram in ONE pass over the lowered
  * bytes, recording only (start, len) offsets per token — no token
  * array, no UTF8String per token, no per-shingle string.
  *
  * Bit-identical to the staged `ShingleHashes(Tokens(text), n)`
  * (parity pinned corpus-wide in TextKernelSpec): same single-space
  * join, same XXH64 seed 42 over the joined UTF-8 bytes, same
  * hash-level first-occurrence dedup. This is the root projection of
  * every minhash/jaccard/novelty operator — at corpus scale the token
  * array was pure allocation overhead between two kernels that only
  * ever needed byte offsets. */
object TextShingleHashesKernel extends Serializable {
  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  /** Distinct gram hashes, first-occurrence order (dedup consumers). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val all = positional(text, n)
    val out = new Array[Long](all.length)
    val seen = new java.util.HashSet[java.lang.Long](all.length * 2)
    var outLen = 0
    var i = 0
    while (i < all.length) {
      if (seen.add(all(i))) { out(outLen) = all(i); outLen += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  /** POSITIONAL gram hashes — one per gram position, duplicates kept
    * (span/winnowing consumers need positions). */
  def positional(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    // token offset table (starts/ends), ~5 bytes/token estimate floor 16
    var starts = new Array[Int](math.max(16, len / 5 + 1))
    var ends = new Array[Int](starts.length)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, m * 2)
          ends = java.util.Arrays.copyOf(ends, m * 2)
        }
        starts(m) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(m) = i
        m += 1
      }
    }
    if (m < n) return Array.emptyLongArray
    val nShingles = m - n + 1
    val out = new Array[Long](nShingles)
    var buf = new Array[Byte](256)
    var s = 0
    while (s < nShingles) {
      // gram bytes = Σ token lengths + (n-1) single-space separators
      var gl = n - 1
      var j = 0
      while (j < n) { gl += ends(s + j) - starts(s + j); j += 1 }
      // in-place iff every inter-token gap is exactly one byte AND that
      // byte is 0x20 (a 1-byte '\t' or '\n' gap still joins as ' ')
      var inPlace = gl == ends(s + n - 1) - starts(s)
      j = 0
      while (inPlace && j < n - 1) {
        if (bytes(ends(s + j)) != 0x20) inPlace = false
        j += 1
      }
      val h =
        if (inPlace) {
          // the source bytes already ARE the joined gram: zero copy
          XXH64.hashUnsafeBytes(bytes,
            Platform.BYTE_ARRAY_OFFSET + starts(s), gl, 42L)
        } else {
          if (gl > buf.length)
            buf = new Array[Byte](math.max(gl, buf.length * 2))
          var pos = 0
          j = 0
          while (j < n) {
            if (j > 0) { buf(pos) = ' '; pos += 1 }
            val tl = ends(s + j) - starts(s + j)
            System.arraycopy(bytes, starts(s + j), buf, pos, tl)
            pos += tl
            j += 1
          }
          XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
        }
      out(s) = h
      s += 1
    }
    out
  }

  def positionalData(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(positional(text, n))
}

case class TextShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_text_shingle_hashes needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextShingleHashesKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val kernel = ctx.addReferenceObj("textShingleKernel",
      TextShingleHashesKernel, TextShingleHashesKernel.getClass.getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $kernel.compute($s, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TextShingleHashes = copy(child = newChild)
}

object TextShingleHashes {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(
      TextShingleHashes(ColumnBridge.expression(text), n))
}

/** Positional twin of [[TextShingleHashes]] — one hash per gram
  * position, duplicates kept; bit-parity with
  * `PosShingleHashes(Tokens(text), n)` pinned in TextKernelSpec. The
  * feeder of the span-level dedup family (duplicateSpans,
  * trimDuplicateParagraphs), where gram POSITION is the payload. */
case class TextPosShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_pos_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_text_pos_shingle_hashes needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextShingleHashesKernel.positionalData(
      input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val kernel = ctx.addReferenceObj("textShingleKernel",
      TextShingleHashesKernel, TextShingleHashesKernel.getClass.getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $kernel.positionalData($s, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TextPosShingleHashes = copy(child = newChild)
}

object TextPosShingleHashes {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(
      TextPosShingleHashes(ColumnBridge.expression(text), n))
}
