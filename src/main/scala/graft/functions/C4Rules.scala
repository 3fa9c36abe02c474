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
  * Pure row-local codegen'd HOF/regex work — no shuffle, no UDF; composes
  * with [[TextFunctions.gopherMetrics]] as independent keep signals.
  */
object C4Rules {

  val MinLineWords = 5
  val MinSentences = 3

  /** `\z`, not `$`: Java's `$` matches before a final U+2028/U+2029. */
  private val TerminalRe = "[.!?\"]\\z"

  /** RE2 and Java agree on ASCII `\b`. */
  private val JavascriptRe = "\\bjavascript\\b"

  /** Struct of `clean_text` (kept lines rejoined with `\n`), `n_lines`
    * (kept-line count), `sentences` (terminal marks in the cleaned text)
    * and `keep` (the page verdict).
    */
  def c4Metrics(text: Column): Column = {
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
