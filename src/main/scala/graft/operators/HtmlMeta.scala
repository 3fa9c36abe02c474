package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metadata extraction from raw crawl HTML (`html: binary`), the sibling of
  * [[graft.engine.TextExtract]]'s body-text extraction: title, robots
  * directives, canonical link, and declared charset — plus the crawl-hygiene
  * filter that drops `noindex` pages before they enter dedup or training
  * shards (a page that asks not to be indexed is usually thin, duplicated,
  * or paywalled).
  *
  * Deliberately exactly-specified regex parsing, not an HTML parser: the
  * rules below are the whole contract, each mirrors 1:1 into DuckDB for the
  * oracle, and every column is a row-local codegen'd expression — zero
  * shuffle, scales linearly with input bytes at 100 TB.
  *
  * Parsing contract (all case-insensitive, DOTALL, first match wins):
  *  - title:     `<title ...>CONTENT</title>`, non-greedy content
  *  - meta:      `<meta name="N" content="C">` — name-before-content
  *                attribute order only, single or double quotes
  *  - canonical: `<link rel="canonical" href="H">` — rel-before-href
  *  - charset:   `<meta charset=C>` with C unquoted or quoted
  * Null html → null columns (decode propagates null); no match → empty
  * string (Spark and DuckDB regexp_extract agree on '').
  */
object HtmlMeta {

  private def page(html: Column): Column = decode(html, "UTF-8")

  private val TitleRe = "(?is)<title[^>]*>(.*?)</title>"

  def title(html: Column): Column =
    regexp_extract(page(html), TitleRe, 1)

  /** Content of the first `<meta name="<name>" content="...">`. The name is
    * regex-quoted, so `og:image` or `a.b` match literally.
    */
  def metaContent(html: Column, name: String): Column = {
    val quoted = java.util.regex.Pattern.quote(name)
    regexp_extract(page(html),
      s"""(?is)<meta\\s+name=["']$quoted["']\\s+content=["']([^"']*)["']""", 1)
  }

  /** Raw robots directive list, e.g. "noindex, nofollow". */
  def robotsDirectives(html: Column): Column = metaContent(html, "robots")

  /** True when the robots meta carries a `noindex` token (comma-separated,
    * whitespace-tolerant — spaces/tabs/CR/LF around the token, not just
    * spaces — case-insensitive). Null html → null.
    */
  def hasNoindex(html: Column): Column =
    exists(split(lower(robotsDirectives(html)), ","),
      t => regexp_replace(t, "\\A[ \\t\\r\\n]+|[ \\t\\r\\n]+\\z", "") === "noindex")

  def canonicalUrl(html: Column): Column =
    regexp_extract(page(html),
      """(?is)<link\s+rel=["']canonical["']\s+href=["']([^"']*)["']""", 1)

  def charset(html: Column): Column =
    lower(regexp_extract(page(html),
      """(?is)<meta\s+charset=["']?([A-Za-z0-9_.:-]+)""", 1))

  /** Drop pages whose robots meta says `noindex`. Null-html rows are KEPT
    * (no parseable opinion is not an opt-out) — the schema validator owns
    * null-html policy, not this filter.
    */
  def dropNoindex(df: DataFrame, html: Column): DataFrame =
    df.where(!coalesce(hasNoindex(html), lit(false)))
}
