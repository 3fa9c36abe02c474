package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of web_pages-shaped frames from the driver's
  * TPC-H-ish parquet (FIXTURES.md §5): pure column expressions with exact
  * ANSI-SQL twins so the DuckDB oracle can reproduce every byte.
  *
  * Injected violations (all keyed on o_orderkey, mirroring the FIXTURES.md
  * dirty variants):
  *  - %97: url reuses the previous key's url  → uniqueness violations
  *  - %53: text NULL                          → not-null violations
  *  - %71: text gets one trailing space       → byte-identical-text violations
  *  - lineitem l_linenumber=3: child key bumped out of range → referential
  */
object Derive {

  /** Spark side of the wp frame. Columns: part, url, warc_ts, html, text,
    * lang (+ canon for internal use). `partition` alias `part` avoids the
    * reserved word in the oracle SQL.
    */
  def webPages(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val key = col("o_orderkey")
    val k = when(key % 97 === 0 && key > 0, key - 1).otherwise(key)
    val canon = concat(col("o_orderpriority"), lit(" order "), key.cast("string"))
    val url = concat(lit("https://d"), (k % 100).cast("string"),
      lit(".example.org/p/"), k.cast("string"))
    val text = when(key % 53 === 0, lit(null).cast("string"))
      .when(key % 71 === 0, concat(canon, lit(" ")))
      .otherwise(canon)
    val lang = when(key % 6 === 0, "en").when(key % 6 === 1, "en")
      .when(key % 6 === 2, "de").when(key % 6 === 3, "fr")
      .when(key % 6 === 4, "es").otherwise("ru")
    o.select(
      date_format(col("o_orderdate"), "yyyy-MM").as("part"),
      url.as("url"),
      col("o_orderdate").as("warc_ts"),
      encode(concat(lit("<html><body><p>"), canon, lit("</p></body></html>")), "UTF-8")
        .as("html"),
      text.as("text"),
      lang.as("lang"),
      canon.as("canon"))
  }

  /** DuckDB twin of [[webPages]] as a CTE prefix. Every oracle query starts
    * with this.
    */
  val WpSql: String =
    """WITH wp AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS part,
      |         'https://d' || CAST(k % 100 AS VARCHAR) || '.example.org/p/' || CAST(k AS VARCHAR) AS url,
      |         o_orderdate AS warc_ts,
      |         CASE WHEN o_orderkey % 53 = 0 THEN NULL
      |              WHEN o_orderkey % 71 = 0 THEN canon || ' '
      |              ELSE canon END AS text,
      |         CASE WHEN o_orderkey % 6 IN (0, 1) THEN 'en'
      |              WHEN o_orderkey % 6 = 2 THEN 'de'
      |              WHEN o_orderkey % 6 = 3 THEN 'fr'
      |              WHEN o_orderkey % 6 = 4 THEN 'es'
      |              ELSE 'ru' END AS lang,
      |         canon
      |  FROM (SELECT *,
      |          CASE WHEN o_orderkey % 97 = 0 AND o_orderkey > 0
      |               THEN o_orderkey - 1 ELSE o_orderkey END AS k,
      |          o_orderpriority || ' order ' || CAST(o_orderkey AS VARCHAR) AS canon
      |        FROM orders))
      |""".stripMargin

  /** Child frame for the referential check: lineitem rows, with every
    * l_linenumber=3 child key bumped out of the parent key space (orphans).
    */
  def linkChild(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.select(
      date_format(col("l_shipdate"), "yyyy-MM").as("part"),
      concat(lit("li:"), col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string")).as("url"),
      col("l_shipdate").as("warc_ts"),
      when(col("l_linenumber") === 3, col("l_orderkey") + 1000000L)
        .otherwise(col("l_orderkey")).as("ck"))
  }

  val LinkChildSql: String =
    """WITH child AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS part,
      |         'li:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) AS url,
      |         CASE WHEN l_linenumber = 3 THEN l_orderkey + 1000000 ELSE l_orderkey END AS ck
      |  FROM lineitem)
      |""".stripMargin

  /** Documents doubled with deterministic duplicates/near-duplicates:
    * every 10th doc appears again (exact dup with shifted id), every 7th
    * appears again with one appended word (near dup).
    */
  def docsWithDups(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val exactDup = d.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"), col("lang"), col("source"))
    val nearDup = d.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"), col("lang"), col("source"))
    d.unionByName(exactDup).unionByName(nearDup)
  }

  val DocsWithDupsSql: String =
    """WITH docs2 AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, lang, source FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' extraword', lang, source FROM documents WHERE doc_id % 7 = 0)
      |""".stripMargin
}
