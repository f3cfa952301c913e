package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Gopher-gate kernel (Rae et al. 2021, §A1.1): returns the
  * document's token count when the gate admits it, −1 when it drops —
  * the whole quality decision AND the count downstream budget stages
  * need, in ONE long.
  *
  * Why one scalar and not (keep, n_tokens) columns: Catalyst's
  * `PushPredicateThroughNonJoin` substitutes projected aliases into
  * pushed filter predicates cost-blind, so ANY multi-column shape gets
  * each referenced column's defining expression re-instantiated in the
  * filter — the HOF formulation measured TWELVE inlined
  * `tokens(text)` copies in the optimized plan (each gate conjunct its
  * own interpreted CodegenFallback array pass; see the round-8 verdict
  * and PlanAuditSpec's gopher pin). With the decision fused into one
  * scalar the pushed predicate is `gopher_admit(text) >= 0` — a single
  * instantiation — and the projection's copy makes TWO evaluations per
  * admitted row worst case, each a zero-allocation byte scan instead
  * of 12 interpreted array builds.
  *
  * Exact-equivalence contract with the declarative battery (pinned by
  * GopherGateSpec against `TextStats.gopherKeepOf(Text.tokens(text))`
  * on the corpus): tokens are maximal runs of non-`\s` bytes of
  * `lower(text)` (UTF8String.toLowerCase — the same lowering `lower()`
  * uses); token length counts codepoints like `length()`; the metric
  * divisions are the identical long→double casts and IEEE divides.
  * Thresholds live in ONE place — [[GopherKernel.keep]] mirrors
  * [[graft.llm.TextStats.gopherKeep]]'s published constants.
  */
object GopherKernel {
  private val Stops: Array[Array[Byte]] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  private def isStop(bytes: Array[Byte], start: Int, len: Int): Boolean = {
    var s = 0
    while (s < Stops.length) {
      val w = Stops(s)
      if (w.length == len) {
        var j = 0
        while (j < len && bytes(start + j) == w(j)) j += 1
        if (j == len) return true
      }
      s += 1
    }
    false
  }

  /** Gopher thresholds over the pass's accumulators — the kernel twin
    * of TextStats.gopherKeep (same constants, same double math). */
  private def keep(nTok: Long, sumLen: Long, nAlpha: Long, nSym: Long,
                   nStop: Long): Boolean =
    nTok >= 50L && nTok <= 100000L && {
      val nd = nTok.toDouble
      val mean = sumLen.toDouble / nd
      mean >= 3.0 && mean <= 10.0 &&
        nAlpha.toDouble / nd >= 0.8 &&
        nSym.toDouble / nd <= 0.1 && nStop >= 2L
    }

  /** n_tokens if the Gopher gate admits the document, else −1. */
  def admit(text: UTF8String): Long = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    var i = 0
    var nTok = 0L; var sumLen = 0L
    var nAlpha = 0L; var nSym = 0L; var nStop = 0L
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        var chars = 0L
        var hasAlpha = false; var hasSym = false; var dots = 0
        while (i < n && !isWs(bytes(i))) {
          val b = bytes(i)
          if ((b & 0xC0) != 0x80) { // first byte of a codepoint
            chars += 1
            if (b == '.') {
              dots += 1; if (dots >= 3) hasSym = true
            } else {
              dots = 0
              if (b >= 'a' && b <= 'z') hasAlpha = true
              else if (b == '#') hasSym = true
            }
          }
          // continuation bytes: the codepoint's first byte already
          // reset the dot run, nothing to do
          i += 1
        }
        nTok += 1; sumLen += chars
        if (hasAlpha) nAlpha += 1
        if (hasSym) nSym += 1
        if (isStop(bytes, start, i - start)) nStop += 1
      }
    }
    if (keep(nTok, sumLen, nAlpha, nSym, nStop)) nTok else -1L
  }
}

case class GopherAdmit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "gopher_admit"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gopher_admit needs string, got ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    GopherKernel.admit(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GopherKernel.admit($s);")
  override protected def withNewChildInternal(newChild: Expression)
      : GopherAdmit = copy(child = newChild)
}

object GopherAdmit {
  def apply(text: Column): Column =
    ColumnBridge.column(GopherAdmit(ColumnBridge.expression(text)))
}
