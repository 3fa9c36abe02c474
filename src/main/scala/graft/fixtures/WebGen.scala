package graft.fixtures

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.TextExtract

/** Deterministic synthetic `web_pages` generator (FIXTURES.md §1).
  *
  * Pure column expressions over `spark.range(n)` — no driver materialization,
  * no RNG objects, no wall clock — so the same recipe scales from 200 rows
  * (unit tests) to millions (bench) and generation itself stays inside
  * whole-stage codegen. Every row is a pure function of its index `i` and the
  * seed, so any subset is reproducible independently.
  */
object WebGen {

  final case class Flags(
      dupUrls: Boolean = false, // every 97th row reuses row i-1's url
      nullText: Boolean = false, // every 53rd row: text = NULL
      badExtract: Boolean = false, // every 71st row: text gets one trailing space
      langDriftDay: Option[String] = None, // that p_day: lang probs shifted
      lenDriftDay: Option[String] = None // that p_day: text length mean ×3
  )

  val Epoch = "2025-07-01 00:00:00" // fixed base, UTC
  val SecondsStep = 37L
  val NDomains = 50

  // deterministic word bank for text bodies (indexed by hash, never random)
  private val WordBank: Seq[String] = Seq(
    "web", "page", "crawl", "index", "link", "data", "text", "open", "net",
    "info", "site", "host", "path", "query", "frame", "image", "style",
    "script", "title", "body")

  /** Deterministic sentence for row i: words chosen and count chosen by mixes
    * of i. Length varies ~[5, 35] words with a heavy-ish tail.
    */
  private def sentence(i: Column, lenBoost: Column): Column = {
    // word count: 5 + (mix % 16) + tail, scaled by lenBoost for drift days
    val mix = abs(xxhash64(i, lit("len")))
    val tail = when(pmod(mix, lit(11)) === 0, pmod(mix, lit(60))).otherwise(lit(0))
    val nWords = ((lit(5) + pmod(mix, lit(16)) + tail) * lenBoost).cast("int")
    // Build by repeating a deterministic 5-word phrase then slicing: phrase
    // choice differs per row; array_repeat + slice + concat_ws stays codegen.
    val phrase = array(WordBank.zipWithIndex.map { case (_, j) =>
      element_at(
        lit(WordBank.toArray),
        (pmod(xxhash64(i, lit(s"w$j")), lit(WordBank.size)) + 1).cast("int"))
    }: _*)
    val repeated = flatten(array_repeat(phrase, lit(8) * lenBoost.cast("int")))
    concat_ws(" ", slice(repeated, lit(1), greatest(nWords, lit(1))))
  }

  /** Generate a clean-or-dirtied frame with columns
    * (url, warc_ts, html, text, lang, p_day). Seeded, fully deterministic.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      flags: Flags = Flags(), slices: Int = 0): DataFrame = {
    val i = col("id")

    // Zipf-ish hot domains (FIXTURES.md): a few domains take most rows.
    val zipf = pmod(floor(pow(pmod(i, lit(1000)).cast("double"), lit(1.7))), lit(NDomains))
    // url unique by construction; dup variant reuses row i-1's key.
    val effKey = if (flags.dupUrls)
      when(pmod(i, lit(97)) === 0 && i > 0, i - 1).otherwise(i)
    else i
    val pathHash = substring(sha2(concat(lit(seed.toString), lit(":"), effKey.cast("string")), 256), 1, 12)
    val effZipf = pmod(floor(pow(pmod(effKey, lit(1000)).cast("double"), lit(1.7))), lit(NDomains))
    val url = concat(lit("https://d"), effZipf.cast("string"), lit(".example.org/p/"), pathHash)

    val ts = (unix_timestamp(lit(Epoch)) + i * SecondsStep).cast("timestamp")
    val pDay = date_format(ts, "yyyy-MM-dd")

    // lang: categorical thresholds over a seeded uniform hash (en .62, de .11,
    // fr .09, es .07, ru .06, zz .05); drift day shifts to en .30 / ru .40.
    val u = pmod(xxhash64(i, lit(seed)), lit(100))
    val langNormal = when(u < 62, "en").when(u < 73, "de").when(u < 82, "fr")
      .when(u < 89, "es").when(u < 95, "ru").otherwise("zz")
    val langDrift = when(u < 30, "en").when(u < 41, "de").when(u < 50, "fr")
      .when(u < 55, "es").when(u < 95, "ru").otherwise("zz")
    val lang = flags.langDriftDay match {
      case Some(day) => when(pDay === day, langDrift).otherwise(langNormal)
      case None => langNormal
    }

    val lenBoost = flags.lenDriftDay match {
      case Some(day) => when(pDay === day, lit(3.0)).otherwise(lit(1.0))
      case None => lit(1.0)
    }
    val bodyText = sentence(i, lenBoost)
    val html = TextExtract.wrapHtml(bodyText)

    val textWithSpace = if (flags.badExtract)
      when(pmod(i, lit(71)) === 0, concat(bodyText, lit(" "))).otherwise(bodyText)
    else bodyText
    val text = if (flags.nullText)
      when(pmod(i, lit(53)) === 0, lit(null).cast("string")).otherwise(textWithSpace)
    else textWithSpace

    val base = if (slices > 0) spark.range(0L, n, 1L, slices) else spark.range(n)
    base.select(
      url.as("url"),
      ts.as("warc_ts"),
      html.as("html"),
      text.as("text"),
      lang.as("lang"),
      pDay.as("p_day"))
  }

  /** Companion `links(src_url, dst_url)` table for the referential check:
    * every 31st dst points at a url that does not exist (FIXTURES.md
    * `orphan_ref`).
    */
  def links(spark: SparkSession, n: Long, pages: Long, seed: Long = 42L): DataFrame = {
    val i = col("id")
    def urlOf(key: Column): Column = {
      val z = pmod(floor(pow(pmod(key, lit(1000)).cast("double"), lit(1.7))), lit(NDomains))
      val h = substring(sha2(concat(lit(seed.toString), lit(":"), key.cast("string")), 256), 1, 12)
      concat(lit("https://d"), z.cast("string"), lit(".example.org/p/"), h)
    }
    val src = pmod(xxhash64(i, lit("src")), lit(pages))
    val dstKey = pmod(xxhash64(i, lit("dst")), lit(pages))
    val dst = when(pmod(i, lit(31)) === 0, urlOf(dstKey + pages * 7))
      .otherwise(urlOf(dstKey))
    spark.range(n).select(urlOf(src).as("src_url"), dst.as("dst_url"))
  }
}
