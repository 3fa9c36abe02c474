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

  test("interpreted and generated eval paths agree (codegen actually runs)") {
    // U+FB03 ffi ligature, U+2460 circled one, fullwidth ASCII?
    // repartition(1) defeats ConvertToLocalRelation, which would otherwise
    // evaluate the Project interpreted at OPTIMIZATION time and make both
    // legs vacuously identical; codegen.fallback=false turns a broken
    // doGenCode into a test failure instead of a silent fallback.
    val in = Seq("e\u0301cole", "x", "\uFB03 \u2460",
      "\uFF21\uFF33\uFF23\uFF29\uFF29\uFF1F").toDF("t").repartition(1)
    def run(confs: (String, String)*) = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try in.select(UnicodeNorm.unicodeNormalize(col("t"), "NFKC"))
        .collect().map(_.getString(0)).sorted.toSeq
      finally confs.foreach { case (k, _) => spark.conf.unset(k) }
    }
    val gen = run("spark.sql.codegen.wholeStage" -> "true",
      "spark.sql.codegen.fallback" -> "false")
    val interp = run("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    assert(gen == interp)
    assert(gen == Seq("\u00e9cole", "x", "ffi 1", "ASCII?").sorted)
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
