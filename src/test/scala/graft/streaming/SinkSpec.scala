package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.engine.{TextExtract, WebPage}

class SinkSpec extends SparkSpec {

  import spark.implicits._

  test("validatedSink: micro-batches append pages + violations per commit") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("sink_out").toString
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    val mem = MemoryStream[WebPage]
    val q = StreamingValidate.validatedSink(mem.toDF(), out, ckpt)
    try {
      def page(i: Int, text: String): WebPage = {
        // html always wraps the canonical body "x"; a text of "x " is then a
        // byte-identical-text violation
        WebPage(s"https://e.org/$i", Timestamp.valueOf(s"2025-07-01 00:00:0$i"),
          TextExtract.wrapHtml("x"), text, "en")
      }
      mem.addData(page(1, "x"), page(2, null)) // one null-text violation
      q.processAllAvailable()
      mem.addData(page(3, "x "), page(4, "x")) // one byte-identical violation
      q.processAllAvailable()
      val pages = spark.read.parquet(s"$out/pages")
      assert(pages.count() == 4)
      val v = spark.read.parquet(s"$out/violations")
        .select("check_name").as[String].collect().sorted.toSeq
      assert(v == Seq("byte_identical_text", "not_null_text"))
    } finally q.stop()
  }

  test("baseline snapshot save/load roundtrip drives drift scoring") {
    import graft.engine.Validator
    import graft.fixtures.WebGen
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("baseline").toString + "/b"
    val clean = WebGen.generate(spark, 3000).withColumnRenamed("p_day", "partition")
    Validator.saveBaseline(clean, dir)
    val baseline = Validator.loadBaseline(spark, dir)
    assert(baseline("lang").nonEmpty && baseline("text_length").nonEmpty)
    // a drifted frame scored against the CLEAN snapshot is flagged
    val drifted = WebGen.generate(spark, 3000,
      flags = WebGen.Flags(langDriftDay = Some("2025-07-01")))
      .withColumnRenamed("p_day", "partition")
      .where(col("partition") === "2025-07-01")
    val res = Validator.validate(drifted,
      Validator.Config(checks = Seq(graft.engine.Constraints.NotNull("text"))),
      baselineProfiles = baseline)
    val z = res.verdicts
      .where(col("check_name") === "drift_zscore_lang")
      .select("passed").as[Boolean].collect().head
    assert(!z, "drifted partition should fail against clean baseline")
  }
}
