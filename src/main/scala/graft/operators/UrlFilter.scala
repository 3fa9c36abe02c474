package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain filtering — the crawl-hygiene stage every web-text pipeline
  * runs before content-level work: drop documents whose host matches a
  * domain blocklist. Matching is SUFFIX-BASED, the way blocklists are
  * written: an entry `example.org` blocks `example.org` AND every
  * subdomain (`a.example.org`, `b.a.example.org`); an entry
  * `d7.example.org` blocks only that subtree.
  *
  * Everything is exactly specified for SQL-oracle parity:
  *  - host = lowercased first capture of `^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)`
  *    (scheme-prefixed URLs only; anything else — null, relative, garbage —
  *    has NO host and is KEPT: rejecting malformed rows is the schema
  *    gate's job, not the domain filter's);
  *  - the host's candidate set = every dot-suffix with >= 2 labels plus the
  *    host itself (a single-label host like `localhost` contributes just
  *    itself); a row is dropped when any candidate appears in the
  *    blocklist (case-insensitive; entries are trimmed + lowercased).
  *
  * Scale: the blocklist rides as a LITERAL array inside a codegen'd
  * row-local predicate (`arrays_overlap`) — no join, no shuffle, no
  * broadcast machinery; the filter pushes like any other predicate. Real
  * blocklists (10^3–10^5 entries) fit a literal comfortably; for
  * million-entry lists, explode the candidate suffixes and LEFT SEMI
  * broadcast-join against a blocklist table instead — same semantics,
  * documented here as the upgrade path.
  */
object UrlFilter {

  /** RFC-3986 scheme shape, shared by [[hostOf]] and [[canonicalizeUrl]]
    * so "is this a scheme-prefixed URL" cannot drift between the blocklist
    * filter and the canonicalizer.
    */
  private[operators] val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*"

  /** Lowercased host of a scheme-prefixed URL; empty string when the URL
    * has no recognizable scheme://host prefix, null for null input.
    */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, s"$SchemeRe://([^/:?#]+)", 1))

  /** The host's blocklist-candidate set: all dot-suffixes with >= 2 labels
    * plus the full host. Null/hostless URLs → empty set (always kept).
    */
  def hostSuffixes(url: Column): Column = {
    val h = hostOf(url)
    val labels = split(h, "\\.")
    when(url.isNull || h === "", array().cast("array<string>"))
      .when(size(labels) <= 1, array(h))
      .otherwise(transform(
        sequence(lit(1), size(labels) - 1),
        i => concat_ws(".", slice(labels, i, size(labels) - i + 1))))
  }

  /** True when the URL's host matches the blocklist (suffix semantics). */
  def blockedBy(url: Column, blockedDomains: Seq[String]): Column = {
    val norm = blockedDomains.map(_.trim.toLowerCase).filter(_.nonEmpty)
    if (norm.isEmpty) lit(false)
    else arrays_overlap(hostSuffixes(url),
      array(norm.map(lit): _*).cast("array<string>"))
  }

  /** The frame minus blocklisted rows. */
  def dropBlockedDomains(df: DataFrame, url: Column,
      blockedDomains: Seq[String]): DataFrame =
    df.where(!blockedBy(url, blockedDomains))

  /** URL canonicalization — the pre-dedup normalization step: two crawls
    * of the same page should collapse to one key before the uniqueness /
    * dedup passes see them. Exactly-specified rules (each replicable in
    * SQL; applied only to scheme-prefixed URLs — anything else, including
    * null, passes through unchanged):
    *  - scheme and host:port lowercased; path/query case PRESERVED, and so
    *    is any userinfo before the last `@` (RFC 3986 makes only scheme
    *    and host case-insensitive — credentials are not),
    *  - default port stripped (`:80` for http, `:443` for https — only
    *    those exact scheme/port pairs),
    *  - fragment (`#...`) dropped,
    *  - query rebuilt: split on `&`, drop empty params and tracking params
    *    starting with `utm_` (case-insensitive), sort the rest
    *    lexicographically (bytewise), rejoin; a query left empty loses its
    *    `?`.
    * Pure row-local codegen'd regex/HOF work — no shuffle, pushes like any
    * projection.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, s"($SchemeRe)://", 1))
    val authRaw = regexp_extract(url, s"$SchemeRe://([^/?#]*)", 1)
    val userinfo = regexp_extract(authRaw, "^(.*@)", 1) // greedy: up to LAST @
    val hostPort = lower(regexp_replace(authRaw, "^.*@", ""))
    val hostNoPort = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_extract(url, s"$SchemeRe://[^/?#]*([^?#]*)", 1)
    val qry = regexp_extract(url, s"$SchemeRe://[^?#]*\\?([^#]*)", 1)
    val params = array_sort(filter(split(qry, "&"),
      p => length(p) > 0 && !lower(p).startsWith("utm_")))
    val qpart = when(size(params) > 0, concat(lit("?"), concat_ws("&", params)))
      .otherwise(lit(""))
    when(url.isNull, lit(null).cast("string"))
      .when(!url.rlike(s"$SchemeRe://"), url)
      .otherwise(concat(scheme, lit("://"), userinfo, hostNoPort, path, qpart))
  }

  /** Per-host document cap — the crawl-balance stage: keep at most
    * `maxPerHost` documents per host so no domain dominates the corpus
    * (mega-hosts contribute millions of near-template pages; training-data
    * pipelines cap them). Selection is DETERMINISTIC: rows are ranked per
    * host by `(md5(url), url)` — a stable pseudo-random total order any SQL
    * engine reproduces (identical lowercase hex) — and ranks above the cap
    * drop. Hostless/malformed URLs group under their empty-string host and
    * share one cap slot-set; null urls are null-host and likewise capped
    * (schema-gate concerns stay out of this operator, same contract as
    * [[dropBlockedDomains]]).
    *
    * Scale: `row_number() <= k` is rewritten by Catalyst's
    * InferWindowGroupLimit into a WindowGroupLimit pair — a PARTIAL
    * group-limit before the exchange and a final one after — so each map
    * task forwards at most k rows per host and a Zipfian hot host (the
    * norm in crawl data) never lands its full row set on one reducer.
    * Plan-asserted in UrlFilterSpec. Duplicate urls (crawl re-fetches) tie in
    * the ordering; which physical twin wins rank 1 is undefined, so
    * url-level output is deterministic but row-level payload columns are
    * only as deterministic as the url→payload mapping — canonicalize or
    * dedup first if that matters.
    */
  def capPerHost(df: DataFrame, url: Column, maxPerHost: Int): DataFrame = {
    require(maxPerHost >= 1, s"maxPerHost must be >= 1, got $maxPerHost")
    val w = Window.partitionBy(hostOf(url)).orderBy(md5(url).asc, url.asc)
    df.withColumn("__host_rank", row_number().over(w))
      .where(col("__host_rank") <= maxPerHost)
      .drop("__host_rank")
  }
}
