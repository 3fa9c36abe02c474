package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style line/page cleaning (the public heuristics behind the C4 corpus,
  * Raffel et al. 2020 §2.2): keep only lines that look like real prose,
  * then drop pages that are code, filler, or too thin after cleaning.
  * Every rule is exactly specified so a SQL oracle reproduces the bytes:
  *
  * Line pass (lines split on `\n`, trimmed of spaces/tabs/CR at both ends
  * with `\A..\z` anchors — same device as [[TextFunctions.gopherMetrics]]):
  *  - keep a line only if its trimmed form ends in a terminal mark
  *    (`.`, `!`, `?` or `"`),
  *  - AND it has at least [[C4Rules.MinLineWords]] whitespace words
  *    ([[TextFunctions.WsClass]] split),
  *  - AND it does not contain the word `javascript` (ASCII word-bounded,
  *    case-insensitive) — the classic cookie/JS-warning boilerplate tell.
  *
  * Page pass (over the ORIGINAL text for the poison rules, the CLEANED
  * text for the thinness rule):
  *  - drop when the raw text contains `{` (leaked code/templating),
  *  - drop when it contains `lorem ipsum` (case-insensitive),
  *  - drop when the cleaned text has fewer than [[C4Rules.MinSentences]]
  *    sentences, counting sentences as occurrences of `.`, `!` or `?` in
  *    the cleaned text (the public rule counts sentences post-cleaning;
  *    terminal-mark occurrences are the exactly-reproducible proxy).
  *
  * Null text behaves as empty: clean `""`, zero lines/sentences, dropped.
  * Row-local, no shuffle — a single-pass Scala UDF since r6 (the HOF
  * expression twin remains as the executable spec, see [[c4MetricsScala]]);
  * composes with [[TextFunctions.gopherMetrics]] as independent keep
  * signals.
  */
object C4Rules {

  val MinLineWords = 5
  val MinSentences = 3

  /** `\z`, not `$`: Java's `$` matches before a final U+2028/U+2029. */
  private val TerminalRe = "[.!?\"]\\z"

  /** RE2 and Java agree on ASCII `\b`. */
  private val JavascriptRe = "\\bjavascript\\b"

  // precompiled patterns for the single-pass Scala twin
  private val LineTrimP =
    java.util.regex.Pattern.compile(TextFunctions.LineTrimRe)
  private val TerminalP = java.util.regex.Pattern.compile(TerminalRe)
  private val JavascriptP = java.util.regex.Pattern.compile(JavascriptRe)
  private val WsSplitP =
    java.util.regex.Pattern.compile(TextFunctions.WsClass + "+")
  private val SentenceP = java.util.regex.Pattern.compile("[.!?]")

  /** The [[c4Metrics]] struct row. Field names/types are the column
    * contract shared with the DuckDB oracle — do not rename.
    */
  final case class C4MetricsRow(
      clean_text: String,
      n_lines: Long,
      sentences: Long,
      keep: Boolean)

  /** Single-pass Scala twin of [[c4MetricsExpr]] — byte-for-byte equal
    * output (property-pinned in C4RulesSpec), one traversal of the text.
    * Same rationale as [[TextFunctions.gopherMetricsScala]]: the HOF
    * expression is CodegenFallback (interpreted, no subexpression
    * elimination) and the optimizer re-expanded the whole line pipeline
    * once per extracted field (4× in the r6 d_curate plan).
    */
  def c4MetricsScala(text: String): C4MetricsRow = {
    val raw = if (text == null) "" else text
    val rawLines = raw.split("\n", -1)
    val sb = new java.lang.StringBuilder
    var nKept = 0
    var i = 0
    while (i < rawLines.length) {
      val l = LineTrimP.matcher(rawLines(i)).replaceAll("")
      if (TerminalP.matcher(l).find() &&
          WsSplitP.split(l, -1).length >= MinLineWords &&
          !JavascriptP.matcher(TextFunctions.sparkLower(l)).find()) {
        if (nKept > 0) sb.append('\n')
        sb.append(l)
        nKept += 1
      }
      i += 1
    }
    val cleanText = sb.toString
    var sentences = 0
    val m = SentenceP.matcher(cleanText)
    while (m.find()) sentences += 1
    val keep = !raw.contains("{") &&
      !TextFunctions.sparkLower(raw).contains("lorem ipsum") &&
      sentences >= MinSentences
    C4MetricsRow(cleanText, nKept.toLong, sentences.toLong, keep)
  }

  /** Struct of `clean_text` (kept lines rejoined with `\n`), `n_lines`
    * (kept-line count), `sentences` (terminal marks in the cleaned text)
    * and `keep` (the page verdict). Runs as the single-pass
    * [[c4MetricsScala]] UDF; [[c4MetricsExpr]] remains the executable spec.
    */
  def c4Metrics(text: Column): Column = {
    val f = udf((t: String) => c4MetricsScala(t))
    f(text)
  }

  /** The original pure-column-function spelling — the spec/property oracle
    * for the UDF (see [[c4MetricsScala]]).
    */
  private[graft] def c4MetricsExpr(text: Column): Column = {
    val raw = coalesce(text, lit(""))
    val kept = filter(
      transform(split(raw, "\n", -1),
        l => regexp_replace(l, TextFunctions.LineTrimRe, "")),
      l => l.rlike(TerminalRe) &&
        size(split(l, TextFunctions.WsClass + "+")) >= MinLineWords &&
        !lower(l).rlike(JavascriptRe))
    val cleanText = concat_ws("\n", kept)
    val sentences = size(regexp_extract_all(cleanText, lit("[.!?]"), lit(0)))
    val keep = !raw.contains("{") &&
      !lower(raw).contains("lorem ipsum") &&
      sentences >= MinSentences
    struct(
      cleanText.as("clean_text"),
      size(kept).cast("long").as("n_lines"),
      sentences.cast("long").as("sentences"),
      keep.as("keep"))
  }
}
