package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val norm = UnicodeNorm.unicodeNormalize(col("t"), "NFC")
  private val Composed = "café"      // é as one codepoint
  private val Decomposed = "café"   // e + combining acute

  test("NFC: decomposed accents compose; ASCII and null pass through") {
    val rows = Seq(Decomposed, Composed, "plain ascii text", null)
      .toDF("t").select(norm.as("n")).collect()
    assert(rows(0).getString(0) == Composed)
    assert(rows(1).getString(0) == Composed)
    assert(rows(2).getString(0) == "plain ascii text")
    assert(rows(3).isNullAt(0))
  }

  test("NFKC folds compatibility forms NFC must preserve") {
    // U+FB01 LATIN SMALL LIGATURE FI, U+FF21/U+FF22 fullwidth A/B
    val in = "ﬁle ＡＢ " + Decomposed
    val r = Seq(in).toDF("t")
      .select(
        UnicodeNorm.unicodeNormalize(col("t"), "NFKC").as("k"),
        UnicodeNorm.unicodeNormalize(col("t"), "NFC").as("c"))
      .head()
    assert(r.getString(0) == "file AB " + Composed)
    assert(r.getString(1) == "ﬁle ＡＢ " + Composed)
  }

  test("interpreted and generated eval paths agree") {
    // U+FB03 ffi ligature, U+2460 circled one, fullwidth ASCII?
    val in = Seq("école", "x", "ﬃ ①",
      "ＡＳＣＩＩ？").toDF("t")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try in.select(UnicodeNorm.unicodeNormalize(col("t"), "NFKC"))
        .collect().map(_.getString(0)).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    assert(gen == run("NO_CODEGEN"))
    assert(gen == Seq("école", "x", "ffi 1", "ASCII?"))
  }

  test("the expression stays inside whole-stage codegen") {
    // spark.range + a non-foldable input so neither ConvertToLocalRelation
    // nor constant folding can erase the Project under test
    val plan = spark.range(4)
      .select(UnicodeNorm.unicodeNormalize(
        concat(lit(Decomposed), col("id").cast("string")), "NFC").as("n"))
      .queryExecution.executedPlan
    // the Project carrying the expression must sit under a codegen stage
    // (rendered as the `*(n)` star), not fall back to interpreted eval
    assert(plan.toString.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*")), plan.toString)
  }

  test("unknown normal form fails at construction") {
    intercept[IllegalArgumentException] {
      UnicodeNorm.unicodeNormalize(col("t"), "NFX")
    }
  }
}
