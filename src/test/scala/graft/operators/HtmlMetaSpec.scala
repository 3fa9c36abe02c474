package graft.operators

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlMetaSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  test("title / robots / canonical / charset extract exactly; misses are ''") {
    val html = b(
      """<html><head><META CHARSET="UTF-8">
        |<TITLE>Hello
        | World</TITLE>
        |<meta name='robots' content='NOINDEX, nofollow'>
        |<link rel="canonical" href="https://ex.org/c/1">
        |</head><body><title>second ignored</title></body></html>""".stripMargin)
    val bare = b("<html><body>no head</body></html>")
    val r = Seq(html, bare).toDF("html")
      .select(
        HtmlMeta.title(col("html")).as("t"),
        HtmlMeta.robotsDirectives(col("html")).as("rb"),
        HtmlMeta.hasNoindex(col("html")).as("ni"),
        HtmlMeta.canonicalUrl(col("html")).as("cu"),
        HtmlMeta.charset(col("html")).as("cs"))
      .collect()
    assert(r(0).getString(0) == "Hello\n World")  // DOTALL + non-greedy first match
    assert(r(0).getString(1) == "NOINDEX, nofollow")
    assert(r(0).getBoolean(2))                    // case/space-insensitive token
    assert(r(0).getString(3) == "https://ex.org/c/1")
    assert(r(0).getString(4) == "utf-8")
    assert(r(1).getString(0) == "" && r(1).getString(1) == "")
    assert(!r(1).getBoolean(2) && r(1).getString(3) == "" && r(1).getString(4) == "")
  }

  test("noindex needs the exact token, not a substring") {
    val rows = Seq(
      b("<meta name=\"robots\" content=\"noindexing\">"),   // not a token
      b("<meta name=\"robots\" content=\"nofollow ,\tnoindex\">"), // tab-separated token
      b("<meta name=\"robots\" content=\"all\">"))
      .toDF("html")
      .select(HtmlMeta.hasNoindex(col("html"))).collect()
    assert(!rows(0).getBoolean(0))
    assert(rows(1).getBoolean(0))
    assert(!rows(2).getBoolean(0))
  }

  test("dropNoindex keeps null-html rows and drops only noindex pages") {
    val df = Seq(
      (1L, b("<meta name=\"robots\" content=\"noindex\">")),
      (2L, b("<html>ok</html>")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "html")
    val kept = HtmlMeta.dropNoindex(df, col("html"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("the extraction is row-local: no exchange in the plan") {
    val df = Seq((1L, b("<title>x</title>"))).toDF("id", "html")
      .select(HtmlMeta.title(col("html")), HtmlMeta.hasNoindex(col("html")))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
