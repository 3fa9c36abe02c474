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

  /** Single-pass twin of [[extractTextCol]] — decode + tag strip in one
    * scan, no regex engine. Byte-for-byte equal on valid UTF-8
    * (property-pinned in ConstraintsSpec): strips each '<' through the next
    * '>' (exactly what `replaceAll("<[^>]*>", "")` matches — `[^>]*` admits
    * interior '<', so both consume from a '<' to the FIRST '>' after it); a
    * '<' with no later '>' cannot start a match and is kept literally with
    * the tail. Decoding is STRICT like the column twin: Spark 4's `decode`
    * raises MALFORMED_CHARACTER_CODING on invalid bytes, so this throws
    * (CharacterCodingException) rather than silently substituting U+FFFD —
    * same job outcome, matching contract.
    */
  def extractTextFast(html: Array[Byte]): String = {
    if (html == null) return null
    val s = StandardCharsets.UTF_8.newDecoder()
      .decode(java.nio.ByteBuffer.wrap(html)).toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < n && s.charAt(j) != '>') j += 1
        if (j < n) i = j + 1
        else { sb.append(s, i, n); i = n }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** [[extractTextFast]] as a column — the HOT-path extraction used by the
    * byte-identical-text check (r6). [[extractTextCol]] stays the
    * definitional column spelling AND the implementation behind Bench's
    * machine-noise sentinel: the sentinel's cross-round comparability
    * depends on that expression not changing, so the check takes the fast
    * twin while the spec/sentinel expression is deliberately untouched.
    */
  def extractTextFastCol(html: Column): Column = {
    val f = udf((b: Array[Byte]) => extractTextFast(b))
    f(html)
  }

  /** Inverse used by generators: canonical html wrapper around a text body. */
  def wrapHtml(text: Column): Column =
    encode(concat(lit("<html><body><p>"), text, lit("</p></body></html>")), "UTF-8")

  def wrapHtml(text: String): Array[Byte] =
    s"<html><body><p>$text</p></body></html>".getBytes(StandardCharsets.UTF_8)
}
