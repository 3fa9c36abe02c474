package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for web-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting, shingling.
  *
  * Everything here is deterministic, deliberately simple, and exactly
  * specified so an external oracle can replicate it in ANSI SQL. Most
  * functions are pure `org.apache.spark.sql.functions` expressions;
  * [[gopherMetrics]] runs as a single-pass Scala UDF since r6 (the HOF
  * struct was re-expanded per extracted field by the optimizer — see
  * [[gopherMetricsScala]]), with its expression twin kept as the spec.
  */
object TextFunctions {

  /** Whitespace-token count ([[words]] semantics). Empty/blank → 0. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-style pre-tokenizer count: letter runs, single digits, and single
    * punctuation marks — the classic GPT-2-ish pre-tokenization shape,
    * restricted to an ASCII-safe pattern every regex engine agrees on
    * (so an external SQL oracle reproduces it exactly).
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  def bpeTokenCount(text: Column): Column =
    when(text.isNull, lit(0))
      .otherwise(size(regexp_extract_all(text, lit(BpePattern), lit(0))))

  /** The ASCII whitespace class spelled out (= Java's `\s` exactly), used
    * for every word split/strip: RE2-dialect oracles lack `\x0B` in their
    * `\s`, so the explicit class is the only spelling both engines read
    * identically (same device as [[Dedup]]'s shingle CTEs).
    */
  val WsClass = "[ \\t\\n\\x0B\\f\\r]"

  /** Line-boundary trim, shared by every per-LINE rule (gopher, C4,
    * boilerplate): `[ \t\r]` only — `\n` is the separator the line was
    * split on, never line content, and `\r` tolerates CRLF input.
    * `\A..\z` anchors, not `^..$`: Java's `$` matches before a final
    * U+2028/U+2029/U+0085. Each use has a DuckDB twin written as the
    * equivalent char-set `trim(l, ' ' || chr(9) || chr(13))` — change
    * them together.
    */
  val LineTrimRe = "\\A[ \\t\\r]+|[ \\t\\r]+\\z"

  /** Whitespace-only-line test under the same class/anchors as
    * [[LineTrimRe]].
    */
  val BlankLineRe = "\\A[ \\t\\r]*\\z"

  /** Word array: whitespace split with the boundary stripped by the SAME
    * class as the split — SQL TRIM strips only spaces, so a doc ending in a
    * newline (ubiquitous in web text) used to sprout a phantom empty token
    * that inflated every word-derived metric. Anchored `\A..\z`, not `^..$`:
    * Java's `$` matches BEFORE a final U+2028/U+2029/U+0085, which would
    * strip interior-looking whitespace RE2's end-of-text `$` keeps.
    * Null/blank → empty.
    */
  def words(text: Column): Column = {
    val tt = regexp_replace(text, s"\\A$WsClass+|$WsClass+\\z", "")
    when(text.isNull || tt === "", array().cast("array<string>"))
      .otherwise(split(tt, s"$WsClass+"))
  }

  /** Word n-gram shingles as strings ("w1 w2 ... wn"). Rows with fewer than n
    * words yield a single shingle of all words (never empty for non-blank
    * text) — keeps downstream MinHash total.
    */
  def shingles(text: Column, n: Int): Column = {
    val ws = words(text)
    val cnt = size(ws)
    val full = transform(
      sequence(lit(0), cnt - n),
      j => concat_ws(" ", slice(ws, j + 1, lit(n))))
    when(cnt === 0, array().cast("array<string>"))
      .when(cnt < n, array(concat_ws(" ", ws)))
      .otherwise(full)
  }

  /** n-gram-heuristic language ID: fixed marker-stopword rules, first match
    * wins (en → de → fr → es → ru), 'und' (undetermined) otherwise. The rule
    * is the spec — accuracy is secondary to determinism and SQL parity.
    */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(coalesce(text, lit(""))), lit(" "))
    when(t.contains(" the ") || t.contains(" and ") || t.contains(" of "), "en")
      .when(t.contains(" der ") || t.contains(" und ") || t.contains(" die "), "de")
      .when(t.contains(" le ") || t.contains(" la ") || t.contains(" et "), "fr")
      .when(t.contains(" el ") || t.contains(" los ") || t.contains(" que "), "es")
      .when(t.contains(" и ") || t.contains(" в ") || t.contains(" не "), "ru")
      .otherwise("und")
  }

  /** Quality score in [0,1]: blends length band, alpha ratio and
    * word-length sanity. Exact formula (SQL-replicable):
    *   len_score   = least(1, length(text)/200)
    *   alpha_ratio = (# of [a-z ] chars after lower()) / length
    *   word_len    = avg word length penalty: 1 if in [3,12], else 0.5
    *   score       = round(0.4*len_score + 0.4*alpha_ratio + 0.2*word_len, 6)
    */
  def qualityScore(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val len = length(t).cast("double")
    val lenScore = least(lit(1.0), len / 200.0)
    val alpha = length(regexp_replace(lower(t), "[^a-z ]", "")).cast("double")
    val alphaRatio = when(len === 0, 0.0).otherwise(alpha / len)
    val nTok = tokenCount(t).cast("double")
    val avgWordLen = when(nTok === 0, 0.0)
      .otherwise((len - (nTok - 1.0)) / nTok)
    val wordLenScore = when(avgWordLen.between(3.0, 12.0), 1.0).otherwise(0.5)
    round(lit(0.4) * lenScore + lit(0.4) * alphaRatio + lit(0.2) * wordLenScore, 6)
  }

  /** Content fingerprint: md5 of the whitespace-normalized, lowercased text.
    * Deterministic and replicable in any SQL engine with md5().
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(coalesce(text, lit("")))), s"$WsClass+", " "))

  /** 64-bit rolling polynomial fingerprint (Karp–Rabin flavor) over the
    * normalized text bytes, as a codegen-friendly aggregate over the char
    * array: h = h*31 + c (wrapping Long). Used where a cheap orderable
    * fingerprint beats md5 strings.
    */
  def rollingHash(text: Column): Column = {
    val norm = regexp_replace(lower(trim(coalesce(text, lit("")))), s"$WsClass+", " ")
    val codes = transform(split(norm, ""), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => acc * 31L + c)
  }

  /** PII redaction patterns — a conservative subset on which Java regex and
    * RE2 (DuckDB/Go/Rust engines) agree exactly: character classes,
    * bounded/unbounded repetition, no lookaround, no backreferences. Order
    * of application matters and is fixed in [[redactPii]]: emails first
    * (their local part can contain digit runs), then IPv4 (its octets are
    * short digit runs), then bare digit runs of 8+ (phone/card/account-ish;
    * 8 avoids years, zip codes, and ordinary quantities).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val DigitRunPattern = "[0-9]{8,}"

  /** Replace email addresses, IPv4 literals, and 8+-digit runs with typed
    * placeholder tokens. Pure codegen'd `regexp_replace` chain — scales as
    * a row-local projection; null-safe (null in → null out, like the
    * engine's other string functions).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      DigitRunPattern, "<NUM>")

  /** Intra-document repetition ratio — the Gopher/RefinedWeb-style
    * boilerplate signal: the fraction of word n-gram occurrences that are
    * REPEATS of an n-gram already seen in the same document,
    * `1 - distinct(shingles)/total(shingles)`. 0 = no repeated n-gram,
    * → 1 for a document that loops one phrase. Texts too short to carry n
    * words score 0 (a single all-words shingle cannot repeat), as do
    * null/blank texts. Pure row-local arithmetic over [[shingles]] — no
    * shuffle, exactly replicable in SQL.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    when(size(sh) <= 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
  }

  /** Within-document duplicate-line removal — the RefinedWeb-style cleanup
    * that keeps only the FIRST occurrence of each exact line. Blank lines
    * (empty after trimming spaces/tabs/CR, so CRLF separator lines count)
    * are structure, not content, and are always kept; every later repeat
    * of a non-blank line is dropped. Pure row-local higher-order-function
    * work (split → indexed filter → join), no shuffle, null in → null out.
    *
    * Cost is O(L²) in the doc's LINE count (`array_position` rescans from
    * the front for each element) — nothing for prose documents (10²–10³
    * lines), but a pathological 10⁵-line log-like payload burns minutes in
    * one task; route such corpora through the
    * `graft.operators.Boilerplate.stripFrequentLines` explode→groupBy
    * shape (per-line rows, one shuffle) instead. Cross-document
    * boilerplate (the same footer in thousands of pages) also belongs
    * there — frequency across docs is a corpus property this row-local
    * function cannot see.
    */
  /** Gopher stop-word set (Rae et al. 2021, "Scaling Language Models"):
    * a kept document must contain at least two of these.
    */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Exact UTF-16 → Spark `length()` parity: Spark counts CODE POINTS
    * (UTF8String.numChars), Java's String.length counts UTF-16 units.
    */
  private def numChars(s: String): Int = s.codePointCount(0, s.length)

  /** Spark `lower()` parity: UTF8String lowercases all-ASCII strings with a
    * locale-independent byte map and falls back to String.toLowerCase for
    * anything else. Divergence beyond that fast path cannot flip any rule
    * here: the only non-ASCII uppercase chars that lower INTO ASCII are
    * exotic (Kelvin K → k) and appear in none of the matched words
    * (property-pinned against the expression twin in TextFunctionsSpec).
    */
  private[functions] def sparkLower(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (!ascii) s.toLowerCase
    else {
      val a = s.toCharArray
      var j = 0
      while (j < a.length) {
        val c = a(j)
        if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
        j += 1
      }
      new String(a)
    }
  }

  // precompiled per-JVM patterns for the single-pass metric loops
  private val WsSplitP = java.util.regex.Pattern.compile(s"$WsClass+")
  private val WsTrimP = java.util.regex.Pattern.compile(s"\\A$WsClass+|$WsClass+\\z")
  private val LineTrimP = java.util.regex.Pattern.compile(LineTrimRe)
  private val AlphaP = java.util.regex.Pattern.compile("[A-Za-z]")

  /** [[words]] as a Scala function — identical regex engine (Java), identical
    * trim/split classes and anchors; null/blank → empty.
    */
  private[functions] def wordsScala(text: String): Array[String] = {
    if (text == null) return Array.empty
    val tt = WsTrimP.matcher(text).replaceAll("")
    if (tt.isEmpty) Array.empty else WsSplitP.split(tt, -1)
  }

  /** The [[gopherMetrics]] struct row. Field names/types are the column
    * contract shared with the DuckDB oracle — do not rename.
    */
  final case class GopherMetricsRow(
      n_words: Long,
      mean_word_len: Double,
      alpha_frac: Double,
      bullet_frac: Double,
      ellipsis_frac: Double,
      stop_hits: Long,
      keep: Boolean)

  /** Single-pass Scala twin of [[gopherMetricsExpr]] — byte-for-byte equal
    * output (property-pinned in TextFunctionsSpec), one traversal of the
    * text instead of one per struct field. Exists for the same reason as
    * the MinHash/SimHash/cosine loops: higher-order-function column
    * expressions are CodegenFallback — interpreted per element AND excluded
    * from subexpression elimination, so the optimizer's getField expansion
    * re-evaluated the whole word/line pipeline once per extracted metric
    * (7× in the d_gopher plan, measured dominant).
    */
  def gopherMetricsScala(text: String): GopherMetricsRow = {
    val ws = wordsScala(text)
    val nWords = ws.length
    var sumLen = 0L
    var alphaCnt = 0
    val stopSeen = new Array[Boolean](GopherStopWords.length)
    var i = 0
    while (i < nWords) {
      val w = ws(i)
      sumLen += numChars(w)
      if (AlphaP.matcher(w).find()) alphaCnt += 1
      val lw = sparkLower(w)
      var s = 0
      while (s < GopherStopWords.length) {
        if (!stopSeen(s) && lw == GopherStopWords(s)) stopSeen(s) = true
        s += 1
      }
      i += 1
    }
    var stopHits = 0
    var s = 0
    while (s < stopSeen.length) { if (stopSeen(s)) stopHits += 1; s += 1 }
    // non-blank lines after the per-line [ \t\r] trim — same split/anchors
    val rawLines = (if (text == null) "" else text).split("\n", -1)
    var nLines = 0
    var bullets = 0
    var ellipses = 0
    var j = 0
    while (j < rawLines.length) {
      val l = LineTrimP.matcher(rawLines(j)).replaceAll("")
      if (l.nonEmpty) {
        nLines += 1
        if (l.startsWith("-") || l.startsWith("*") || l.startsWith("•")) bullets += 1
        if (l.endsWith("...") || l.endsWith("…")) ellipses += 1
      }
      j += 1
    }
    val meanLen = if (nWords == 0) 0.0 else sumLen.toDouble / nWords
    val alphaFrac = if (nWords == 0) 0.0 else alphaCnt.toDouble / nWords
    val bulletFrac = if (nLines == 0) 0.0 else bullets.toDouble / nLines
    val ellipsisFrac = if (nLines == 0) 0.0 else ellipses.toDouble / nLines
    val keep = nWords >= 50 && nWords <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      alphaFrac >= 0.8 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      stopHits >= 2
    GopherMetricsRow(nWords.toLong, meanLen, alphaFrac, bulletFrac,
      ellipsisFrac, stopHits.toLong, keep)
  }

  /** Gopher-rule quality metrics — the standard web-text repetition/format
    * filters, exactly specified for SQL-oracle parity. Returns a struct of
    *  - `n_words`      whitespace words ([[words]] semantics),
    *  - `mean_word_len` sum(len(word))/n_words (one IEEE division; 0 when
    *                    the doc is empty),
    *  - `alpha_frac`   fraction of words containing an ASCII letter,
    *  - `bullet_frac`  fraction of NON-BLANK lines whose trimmed form
    *                   starts with `-`, `*` or `•` (lines split on `\n`,
    *                   trimmed of spaces/tabs/CR so CRLF input behaves;
    *                   blank lines — including the phantom after a final
    *                   newline — are excluded from both sides of the
    *                   fraction; 0 when no non-blank line exists),
    *  - `ellipsis_frac` fraction of NON-BLANK lines whose trimmed form
    *                   ends with `...` or `…`,
    *  - `stop_hits`    DISTINCT [[GopherStopWords]] present (lowercased),
    *  - `keep`         the Gopher conjunction: 50 <= n_words <= 100000,
    *                   3 <= mean_word_len <= 10, alpha_frac >= 0.8,
    *                   bullet_frac <= 0.9, ellipsis_frac <= 0.3,
    *                   stop_hits >= 2 (raw, un-rounded values).
    * Row-local, no shuffle; null text behaves as empty (n_words 0, keep
    * false). Runs as the single-pass [[gopherMetricsScala]] UDF: the
    * deterministic UDF is subexpression-eliminated to ONE evaluation per
    * row however many fields a query extracts, where the HOF expression
    * twin ([[gopherMetricsExpr]], kept as the spec + property oracle) is
    * re-expanded per field by the optimizer and interpreted per element
    * (r6 measurement: 7 expansions in the d_gopher plan).
    */
  def gopherMetrics(text: Column): Column = {
    val f = udf((t: String) => gopherMetricsScala(t))
    f(text)
  }

  /** The original pure-column-function spelling of [[gopherMetrics]] — the
    * executable spec the UDF is property-pinned against (one HOF/regex
    * subtree per metric; see [[gopherMetricsScala]] for why it is no longer
    * the hot path).
    */
  private[graft] def gopherMetricsExpr(text: Column): Column = {
    val ws = words(text)
    val nWords = size(ws)
    val lines = filter(
      transform(split(coalesce(text, lit("")), "\n", -1),
        l => regexp_replace(l, LineTrimRe, "")),
      l => l =!= "")
    val nLines = size(lines)
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise(aggregate(ws, lit(0L), (a, w) => a + length(w))
        .cast("double") / nWords)
    val alphaFrac = when(nWords === 0, lit(0.0))
      .otherwise(size(filter(ws, w => w.rlike("[A-Za-z]")))
        .cast("double") / nWords)
    val bulletFrac = when(nLines === 0, lit(0.0))
      .otherwise(size(filter(lines, l =>
          l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
        .cast("double") / nLines)
    val ellipsisFrac = when(nLines === 0, lit(0.0))
      .otherwise(size(filter(lines, l =>
          l.endsWith("...") || l.endsWith("…"))).cast("double") / nLines)
    val stopHits = size(array_intersect(
      transform(ws, w => lower(w)),
      array(GopherStopWords.map(lit): _*)))
    val keep = nWords >= 50 && nWords <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      alphaFrac >= 0.8 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      stopHits >= 2
    struct(
      nWords.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_frac"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      stopHits.cast("long").as("stop_hits"),
      keep.as("keep"))
  }

  def dedupLinesInDoc(text: Column): Column = {
    val ls = split(text, "\n", -1)
    when(text.isNull, lit(null).cast("string"))
      .otherwise(concat_ws("\n",
        filter(ls, (x, i) =>
          x.rlike(BlankLineRe) ||
            array_position(ls, x) === (i + 1).cast("long"))))
  }
}
