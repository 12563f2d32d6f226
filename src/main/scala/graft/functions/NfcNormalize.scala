package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Spark has no built-in Unicode-normalize function, and web-scraped corpora
  * mix precomposed and combining-mark encodings of the same glyph ("café" as
  * café vs café) — without canonicalization, exact dedup, n-gram
  * matching, and tokenization all silently treat equal text as different.
  * This stays inside whole-stage codegen (a Scala UDF here would box every
  * row and break the codegen span around the narrow curation projections).
  *
  * Fast path: pure-ASCII strings (the overwhelming majority of most corpora)
  * are returned as-is without materializing a java.lang.String — the
  * normalizer only runs when a non-ASCII byte is present.
  *
  * Portability contract: Unicode NFC is a fully-specified canonical form, so
  * Java's `java.text.Normalizer` and DuckDB's utf8proc `nfc_normalize` agree
  * byte-for-byte on the UTF-8 result (asserted by the q64 oracle hash).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, str => s"graft.functions.NfcNormalize.normalize($str)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    if (isAscii(s)) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  private def isAscii(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) return false
      i += 1
    }
    true
  }
}
