package graft.engine

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML→text extraction, defined ONCE and shared by the fixture
  * generator and the byte-identical-text constraint (SURVEY §7.5 risk 2).
  *
  * Deliberately minimal and fully specified: UTF-8 decode, strip `<...>` tags,
  * no trimming, no whitespace collapsing, no entity decoding. Whatever this
  * function returns IS the definition of "extracted text" for the engine; the
  * invariant checked is `text === extractText(html)` byte-for-byte.
  */
object TextExtract {

  private val TagRe = "<[^>]*>"

  /** Driver/executor-side Scala version (used by generators and tests). */
  def extractText(html: Array[Byte]): String =
    if (html == null) null
    else new String(html, StandardCharsets.UTF_8).replaceAll(TagRe, "")

  /** Column version — pure built-in functions so it stays inside whole-stage
    * codegen (same Java-regex semantics as the Scala version above).
    */
  def extractTextCol(html: Column): Column =
    regexp_replace(decode(html, "UTF-8"), TagRe, "")

  /** Inverse used by generators: canonical html wrapper around a text body. */
  def wrapHtml(text: Column): Column =
    encode(concat(lit("<html><body><p>"), text, lit("</p></body></html>")), "UTF-8")

  def wrapHtml(text: String): Array[Byte] =
    s"<html><body><p>$text</p></body></html>".getBytes(StandardCharsets.UTF_8)
}
