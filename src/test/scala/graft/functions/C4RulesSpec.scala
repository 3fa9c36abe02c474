package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C4-style line/page cleaning: each line rule and page poison flips the
  * outcome exactly; null text behaves as empty.
  */
class C4RulesSpec extends SparkSpec {

  import spark.implicits._

  private def run(text: String): (String, Long, Long, Boolean) = {
    val m = C4Rules.c4Metrics(col("t"))
    val r = Seq(Option(text)).toDF("t")
      .select(m.getField("clean_text"), m.getField("n_lines"),
        m.getField("sentences"), m.getField("keep"))
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
  }

  private val s1 = "The first proper sentence of this page ends here."
  private val s2 = "Another complete sentence follows with plenty of words!"
  private val s3 = "Does this page have a third real sentence?"

  test("a clean three-sentence page is kept verbatim") {
    val (clean, n, sent, keep) = run(s"$s1\n$s2\n$s3")
    assert(clean == s"$s1\n$s2\n$s3")
    assert(n == 3 && sent == 3 && keep)
  }

  test("line rules: no terminal mark, too few words, javascript — each drops its line only") {
    val (clean, n, sent, keep) = run(
      s"""$s1
         |no terminal punctuation on this line at all
         |Too short here.
         |Please enable javascript to view this content.
         |  $s2
         |$s3""".stripMargin)
    // the indented s2 line is trimmed before the rules AND in the output
    assert(clean == s"$s1\n$s2\n$s3", clean)
    assert(n == 3 && sent == 3 && keep)
  }

  test("quoted-speech terminal and Javascript case-insensitivity") {
    val quoted = "He said the words were \"finally over here.\""
    val (clean, _, _, _) = run(s"$quoted\nWarning this page needs JavaScript enabled today.")
    assert(clean == quoted, clean)
    // 'javascripting' is NOT the bounded word — the line survives
    val kept = run("People were javascripting all over the place then.")._1
    assert(kept.nonEmpty)
  }

  test("page poisons: curly brace and lorem ipsum drop the page, not the lines") {
    val (c1, n1, _, k1) = run(s"$s1 {\n$s2\n$s3")
    assert(!k1 && n1 == 2, s"$n1 $c1") // poisoned line itself fails the terminal rule
    val (c2, n2, _, k2) = run(s"Lorem Ipsum dolor sit amet consectetur.\n$s1\n$s2\n$s3")
    assert(!k2 && n2 == 4, s"$n2 $c2") // the lorem line is a valid LINE; the PAGE drops
  }

  test("thin pages drop: fewer than 3 sentences after cleaning") {
    val (_, n, sent, keep) = run(s"$s1\n$s2")
    assert(n == 2 && sent == 2 && !keep)
    // abbreviation dots count toward the proxy — documented semantics
    assert(run("Mr. E. Smith arrived at noon today.")._4)
  }

  test("null and empty text → empty clean, keep false") {
    assert(run(null) == (("", 0L, 0L, false)))
    assert(run("") == (("", 0L, 0L, false)))
  }

  test("cleaning is idempotent (seeded): c4(clean) == clean, keep verdict stable") {
    val rnd = new scala.util.Random(20260818L)
    val lineBank = Seq(
      "A perfectly ordinary sentence lives right here today.",
      "Short one.",
      "no terminal punctuation on this line at all",
      "Please enable javascript before you continue reading this.",
      "  An indented sentence with plenty of words survives the trim.",
      "Another fine sentence brings the count up nicely!",
      "Does a question also count as a sentence here?")
    (1 to 30).foreach { _ =>
      val text = Seq.fill(3 + rnd.nextInt(6))(lineBank(rnd.nextInt(lineBank.size)))
        .mkString("\n")
      val (clean1, _, _, keep1) = run(text)
      val (clean2, n2, _, keep2) = run(clean1)
      assert(clean2 == clean1, s"not idempotent on:\n$text")
      // a kept page stays kept; a thin page stays dropped (no poisons in
      // the bank, so keep is purely the sentence count — monotone here)
      assert(keep2 == keep1, s"keep flipped on:\n$text")
      assert(n2 == clean1.split("\n", -1).count(_.nonEmpty) ||
        (clean1.isEmpty && n2 == 0))
    }
  }

  test("c4Metrics UDF == expression twin on adversarial inputs (r6 property pin)") {
    import spark.implicits._
    val s1 = "The first proper sentence of this page ends here."
    val bank: Seq[Option[String]] = Seq(
      None, Some(""), Some("\n"), Some("   \t\r"),
      Some(s"$s1\n$s1\n$s1"),
      Some(s"$s1\nPlease enable javascript to view this content.\nShort line."),
      Some(s"$s1 {\n$s1\n$s1"),
      Some(s"Lorem Ipsum dolor sit amet consectetur.\n$s1\n$s1\n$s1"),
      Some("He said \"quoted speech can end a kept line here.\""),
      Some("  \tpadded line with plenty of words ends well.  \t\r"),
      Some("caf\u00e9 d\u00e9j\u00e0 vu sentence with accents ends here."),
      Some("JAVASCRIPT warning in upper case with many words here."),
      Some("a\u2028b.\u2029c?\u0085d!"),
      Some("one.\ntwo!\nthree?"),
      Some(("Repeated sentence with plenty of ordinary words ends here.\n" * 500)))
    val df = bank.toDF("t")
    val u = C4Rules.c4Metrics(col("t")).as("u")
    val e = C4Rules.c4MetricsExpr(col("t")).as("e")
    val rows = df.select(u, e).collect()
    rows.zip(bank).foreach { case (r, in) =>
      assert(r.getStruct(0) == r.getStruct(1),
        s"UDF != expr on ${in.map(_.take(60))}: ${r.getStruct(0)} vs ${r.getStruct(1)}")
    }
  }
}
