package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning — the first step of
  * every web-scale text pipeline (C4/CCNet normalize before any dedup
  * or filtering, else byte-different spellings of the same text defeat
  * content hashing): NFC canonical composition (é as one codepoint,
  * not e + combining acute) and accent stripping (NFD then drop
  * combining marks — the fingerprint/search normalization). Both are
  * native codegen Expressions over the JDK's `java.text.Normalizer`
  * (the Unicode-conformant implementation already on every executor —
  * no dictionary tables to broadcast, map-only, shuffle-free).
  *
  * Determinism: Unicode normalization forms are bijections of
  * codepoint sequences defined by the standard — any conformant
  * implementation produces identical bytes, which makes both oracle-
  * checkable cross-engine (DuckDB's utf8proc-backed `nfc_normalize` /
  * `strip_accents` hash-match: q_nfc_norm, q_strip_accents). */
object TextNormKernel {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** NFD-decompose, then drop every combining mark (Unicode category
    * Mn) — á→a, ü→u, ñ→n; non-Latin scripts pass through minus their
    * combining marks, the utf8proc `strip_accents` convention. */
  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs string, got ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    TextNormKernel.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextNormKernel.nfc($s);")
  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"strip_accents needs string, got ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    TextNormKernel.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextNormKernel.stripAccents($s);")
  override protected def withNewChildInternal(newChild: Expression)
      : StripAccents = copy(child = newChild)
}

object StripAccents {
  def apply(text: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(text)))
}
