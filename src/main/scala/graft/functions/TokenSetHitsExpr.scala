package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count (with multiplicity) of tokens belonging to a fixed word set —
  * EXACT string membership, == `size(filter(tokens(text),
  * t -> array_contains(words, t)))` (parity pinned in TextKernelSpec).
  * One pass over the lowered bytes: each token is wrapped (not copied)
  * as a UTF8String and probed against a prebuilt hash set, where the
  * HOF form dispatched an interpreted lambda per token and scanned the
  * word array linearly inside it.
  *
  * The stopword-evidence primitive: quality ratios, language ID and
  * the q_pipeline_clean gate all reduce to it, and all of them sit in
  * pushed-down filter predicates where the HOF form re-tokenized the
  * corpus inside the scan condition. */
class TokenSetHitsKernel(words: Seq[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  def hits(text: UTF8String): Int = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    var c = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        if (set.contains(UTF8String.fromBytes(bytes, start, i - start)))
          c += 1
      }
    }
    c
  }
}

case class TokenSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_set_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_token_set_hits needs string, got ${other.catalogString}")
    }

  @transient private lazy val kernel = new TokenSetHitsKernel(words)

  override def nullSafeEval(input: Any): Any =
    kernel.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val k = ctx.addReferenceObj("tokenSetHitsKernel", kernel,
      classOf[TokenSetHitsKernel].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $k.hits($t);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenSetHits = copy(child = newChild)
}

object TokenSetHits {
  def apply(text: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenSetHits(
      ColumnBridge.expression(text), words))
}

/** Language ID in one pass: per-language stopword evidence counts plus
  * the argmax, fused. == the composed spec (`array_max` over
  * (hits, reverse-ord, lang) structs of per-language
  * [[TokenSetHits]]): highest hit count wins, ties to the
  * lexicographically SMALLEST language code, zero evidence → "und".
  * One map probe per token (a word shared by several languages carries
  * all its language indexes), where the composed form ran one
  * interpreted filter lambda per token PER LANGUAGE.
  *
  * One intentional divergence, pinned in TextKernelSpec: NULL text is
  * NULL here (the composed struct-max returned an arbitrary language
  * for a null token array — a row no consumer should label). */
class LangIdKernel(profiles: Seq[(String, Seq[String])])
    extends Serializable {
  private val langs: Array[String] = profiles.map(_._1).toArray
  @transient private lazy val wordLangs
      : java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(li) else prev :+ li)
      }
    }
    m
  }

  // the shared whitespace contract — see TextBytes.isWs
  private def isWs(b: Byte): Boolean = TextBytes.isWs(b)

  def langId(text: UTF8String): UTF8String = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        val ls = wordLangs.get(
          UTF8String.fromBytes(bytes, start, i - start))
        if (ls != null) {
          var j = 0
          while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
        }
      }
    }
    var best = -1
    var bestHits = 0
    var j = 0
    while (j < counts.length) {
      // strict > keeps the first (smallest code, profiles sorted) on ties
      if (counts(j) > bestHits) { bestHits = counts(j); best = j }
      j += 1
    }
    if (best < 0) UTF8String.fromString("und")
    else UTF8String.fromString(langs(best))
  }
}

case class LangId(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  require(profiles.map(_._1) == profiles.map(_._1).sorted,
    "language profiles must be sorted by code (ties go to the smallest)")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lang_id needs string, got ${other.catalogString}")
    }

  @transient private lazy val kernel = new LangIdKernel(profiles)

  override def nullSafeEval(input: Any): Any =
    kernel.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val k = ctx.addReferenceObj("langIdKernel", kernel,
      classOf[LangIdKernel].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $k.langId($t);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LangId = copy(child = newChild)
}

object LangId {
  def apply(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(text), profiles))
}
