// Lives under org.apache.spark.sql to reach the private[sql]
// ExpressionUtils Column↔Expression bridge (same rationale as
// VectorExpressions.scala).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup/fingerprint pipelines:
  * Unicode NFC composition, combining-mark (accent) stripping, and
  * locale-independent lowercasing, as ONE codegen'd expression.
  *
  * Training corpora mix NFC and NFD encodings of the same visible text
  * ("café" composed vs "café" decomposed), so exact and shingle
  * dedup miss semantically identical documents unless a canonical form
  * runs first — the normalize step every corpus pipeline applies before
  * [[graft.operators.Dedup]]. The reference's engine gets this for free
  * from its loader collation (reference: python/import_data.py reads
  * via pandas' UTF-8 codec); on Spark it must be an explicit operator.
  *
  * Scale shape: per-row projection, no shuffle; the ASCII fast path
  * (one byte scan, then UTF8String's own vectorized lowercase) keeps the
  * common case allocation-free — non-ASCII rows pay the Normalizer
  * round-trip, which is unavoidable and CPU-local.
  */
case class NormalizeText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(s: Any): Any =
    TextNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {

  /** NFC + strip combining marks + lowercase (Locale.ROOT). */
  def normalize(s: UTF8String): UTF8String = {
    // ASCII fast path: no marks to strip, byte-level lowercase suffices
    var ascii = true
    val nb = s.numBytes()
    var i = 0
    while (ascii && i < nb) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s.toLowerCase
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val ch = nfd.charAt(j)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      j += 1
    }
    val nfc = java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(nfc.toLowerCase(java.util.Locale.ROOT))
  }

  /** Column wrapper for [[NormalizeText]]. */
  def normText(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))
}
