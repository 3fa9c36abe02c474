package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for web-text cleaning, as a NATIVE Catalyst
  * expression (with `doGenCode`) rather than a Scala UDF — the row-level
  * work stays inside whole-stage codegen with no serialization boundary.
  *
  * Crawled text mixes composed and decomposed accent encodings (é as one
  * codepoint vs e + U+0301), fullwidth forms, and ligatures; exact dedup,
  * shingling, and fingerprinting all treat those byte-distinct twins as
  * different documents unless the corpus is normalized first. NFC is the
  * usual pre-dedup form; NFKC additionally folds compatibility variants
  * (ﬁ → fi, Ａ → A).
  *
  * Scale shape: row-local, zero shuffle. The helper short-circuits pure
  * ASCII (numBytes == numChars) without ever materializing a JVM String —
  * the overwhelmingly common case in web corpora — and returns the input
  * UTF8String unchanged when the text is already in normal form, so the
  * hot path allocates nothing.
  */
object UnicodeNorm {

  /** Static entry shared by the interpreted and generated eval paths
    * (standalone object → scalac emits a `UnicodeNorm` mirror class with a
    * static forwarder Janino can call directly).
    *
    * ASCII is invariant under all four normal forms, so `numBytes ==
    * numChars` (every char 1 byte) skips normalization entirely.
    */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    if (s.numBytes == s.numChars) s
    else {
      val form = Normalizer.Form.valueOf(formName)
      val str = s.toString
      if (Normalizer.isNormalized(str, form)) s
      else UTF8String.fromString(Normalizer.normalize(str, form))
    }
  }

  /** Column wrapper; `form` is one of NFC | NFD | NFKC | NFKD. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(
      UnicodeNormalizeExpr(ColumnBridge.expression(text), form))
}

/** `unicode_normalize(child, form)` — see [[UnicodeNorm]]. Null in → null
  * out (UnaryExpression's default null handling around `nullSafeEval`).
  */
case class UnicodeNormalizeExpr(child: Expression, formName: String)
    extends UnaryExpression with ExpectsInputTypes {

  // Fail at construction, not per row, on a bad form name.
  require(
    try { Normalizer.Form.valueOf(formName); true }
    catch { case _: IllegalArgumentException => false },
    s"unknown Unicode normal form '$formName' (expected NFC|NFD|NFKC|NFKD)")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], formName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNorm.normalize($c, "$formName")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
