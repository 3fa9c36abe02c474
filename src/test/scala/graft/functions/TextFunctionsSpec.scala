package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(1).toDF("x").select(c.as("v")).as[T].collect().head

  test("tokenCount: whitespace tokens, blank-safe") {
    val df = Seq("one two three", "  padded  words  ", "", "single", null)
      .toDF("t").select(TextFunctions.tokenCount(col("t")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 2, 0, 1, 0))
  }

  test("langId: marker stopwords, first-match-wins, und fallback") {
    val cases = Seq(
      "the cat sat on of mat" -> "en",
      "der hund und die katze" -> "de",
      "le chat et la souris" -> "fr",
      "el gato que los perros" -> "es",
      "foo bar baz qux" -> "und",
      // 'the' rule fires before 'der' (first match wins)
      "the der hybrid" -> "en")
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.langId(col("t")).as("l")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val fps = Seq("Hello  World", "hello world", "hello worlds")
      .toDF("t").select(TextFunctions.fingerprint(col("t")).as("f"))
      .as[String].collect().toSeq
    assert(fps(0) == fps(1))
    assert(fps(1) != fps(2))
    assert(fps(0) == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }

  test("rollingHash: deterministic, order-sensitive") {
    val hs = Seq("abc", "abc", "acb").toDF("t")
      .select(TextFunctions.rollingHash(col("t")).as("h")).as[Long].collect().toSeq
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
    // h("abc") = (97*31 + 98)*31 + 99
    assert(hs(0) == ((97L * 31 + 98) * 31 + 99))
  }

  test("qualityScore: long clean text scores higher than short junk") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running through the quiet field toward the river bank with steady pace and calm breath under the morning sun",
      "x@#$ 1",
      "").toDF("t")
      .select(TextFunctions.qualityScore(col("t")).as("q")).as[Double].collect().toSeq
    assert(scores(0) > 0.8)
    assert(scores(1) < 0.5)
    assert(scores(2) <= 0.2)
  }

  test("bpeTokenCount: letter runs, single digits, single punctuation") {
    val df = Seq("hello world", "a1b2", "don't stop!", "", null, "42")
      .toDF("t").select(TextFunctions.bpeTokenCount(col("t")).as("n"))
    // "a1b2" → a,1,b,2 ; "don't stop!" → don,',t,stop,! ; "42" → 4,2
    assert(df.as[Int].collect().toSeq == Seq(2, 4, 5, 0, 0, 2))
  }

  test("shingles: n-grams over words; short text yields single shingle") {
    val sh = Seq("a b c d", "a b", "").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3).as("s")).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("a b"))
    assert(sh(2) == Seq.empty)
  }

  test("repetitionRatio: exact fractions; short/blank/null texts score 0") {
    val r = Seq(
      "a b c a b c a b c",   // 7 shingles, 3 distinct → 4/7 repeated
      "w x y z",             // 2 shingles, both distinct → 0
      "one two",             // < 3 words → single shingle → 0
      "",                    // blank → 0
      null.asInstanceOf[String])
      .toDF("t").select(TextFunctions.repetitionRatio(col("t"), 3).as("r"))
      .as[Double].collect().toSeq
    assert(math.abs(r(0) - 4.0 / 7) < 1e-12, r(0).toString)
    assert(r(1) == 0.0 && r(2) == 0.0 && r(3) == 0.0 && r(4) == 0.0, r.toString)
  }

  test("gopherMetrics: each rule exact; the keep conjunction flips per rule") {
    val pass = "the be to of and that have with " + ("alpha " * 52).trim
    val rows = Seq(
      pass,                         // 60 words, all rules pass
      "- a\n- b\n- c\nplain d",     // 3/4 bullet lines, 7 words
      "x...\ny…\nz",                // 2/3 ellipsis lines
      "the to " + ("ok " * 58).trim, // 60 words but mean_word_len 2.2 → fail
      "",                           // blank
      null.asInstanceOf[String])
      .toDF("t")
      .select(TextFunctions.gopherMetrics(col("t")).as("m"))
      .select(col("m.n_words"), col("m.mean_word_len"), col("m.alpha_frac"),
        col("m.bullet_frac"), col("m.ellipsis_frac"), col("m.stop_hits"),
        col("m.keep"))
      .collect()
    val p = rows(0)
    assert(p.getLong(0) == 60L && p.getLong(5) == 8L && p.getBoolean(6), p.toString)
    assert(math.abs(p.getDouble(1) - (24 + 52 * 5) / 60.0) < 1e-12, p.toString)
    assert(p.getDouble(2) == 1.0 && p.getDouble(3) == 0.0, p.toString)
    val b = rows(1)
    assert(b.getDouble(3) == 0.75 && !b.getBoolean(6), b.toString)
    val e = rows(2)
    assert(math.abs(e.getDouble(4) - 2.0 / 3) < 1e-12 && !e.getBoolean(6), e.toString)
    val short = rows(3)
    assert(short.getLong(0) == 60L && short.getDouble(1) < 3.0 && !short.getBoolean(6),
      short.toString)
    assert(rows(4).getLong(0) == 0L && !rows(4).getBoolean(6), rows(4).toString)
    assert(rows(5).getLong(0) == 0L && !rows(5).getBoolean(6), rows(5).toString)
  }

  test("no phantom tokens: boundary non-space whitespace adds no words or lines") {
    // SQL TRIM strips only spaces; a trailing newline used to add an empty
    // word (inflating n_words past Gopher's >=50 floor) and an empty line
    // (deflating bullet_frac below its threshold).
    val r = Seq("a b\n", "\t\t", "- a\n- b\n")
      .toDF("t")
      .select(TextFunctions.tokenCount(col("t")).as("n"),
        TextFunctions.gopherMetrics(col("t")).getField("bullet_frac").as("bf"))
      .collect()
    assert(r(0).getInt(0) == 2, r(0).toString)
    assert(r(1).getInt(0) == 0, r(1).toString)
    assert(r(2).getInt(0) == 4 && r(2).getDouble(1) == 1.0, r(2).toString)
  }

  test("U+2028 lines are content, not blanks (Java $ vs \\z anchor)") {
    // Java's $ matches BEFORE a final U+2028, so a ^..$ blank test calls a
    // U+2028-only line blank (dedup-immune) while the SQL twins' char-set
    // trim does not; \A..\z anchors keep both engines agreeing.
    val r = Seq("a\n \n \na").toDF("t")
      .select(TextFunctions.dedupLinesInDoc(col("t")),
        TextFunctions.words(concat(lit("ab  "), lit(""))))
      .head()
    assert(r.getString(0) == "a\n ")            // repeats deduped
    assert(r.getSeq[String](1) == Seq("ab", " ")) // no boundary strip
  }

  test("dedupLinesInDoc: first occurrence kept, blanks immune, null in → null out") {
    val r = Seq(
      "t\ndup\ndup\n\ndup\nt",   // later repeats drop; blank stays
      "a\n\n\nb",                // repeated BLANK lines all stay
      "a\r\n\r\na\r",            // CRLF: "\r" separator lines are blank
      "solo",
      null.asInstanceOf[String])
      .toDF("t").select(TextFunctions.dedupLinesInDoc(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("t\ndup\n", "a\n\n\nb", "a\r\n\r", "solo", null),
      r.map(Option(_)).toString)
  }

  test("redactPii: emails, IPv4, 8+-digit runs → typed placeholders; short digits survive") {
    val in = Seq(
      "mail bob.smith+x@ex-mail.co.uk now",
      "server at 192.168.0.1 port 8080",
      "card 4111111111111111 zip 90210 year 2024",
      "a1@b.io and 10.0.0.77 and 123456789",
      "clean text with no pii at all").toDF("t")
    val out = in.select(TextFunctions.redactPii(col("t")).as("r"))
      .as[String].collect().toSeq
    assert(out(0) == "mail <EMAIL> now", out(0))
    assert(out(1) == "server at <IP> port 8080", out(1))
    // 16-digit card redacted; 5-digit zip and 4-digit year kept
    assert(out(2) == "card <NUM> zip 90210 year 2024", out(2))
    assert(out(3) == "<EMAIL> and <IP> and <NUM>", out(3))
    assert(out(4) == "clean text with no pii at all", out(4))
    // null-safe: null in → null out
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r")).collect().head
    assert(n.isNullAt(0))
  }

  test("gopherMetrics UDF == expression twin on adversarial inputs (r6 property pin)") {
    val bank: Seq[Option[String]] = Seq(
      None, Some(""), Some("   "), Some("\n"), Some("\n\n\n"),
      Some("the be to of and that have with"),
      Some("The quick brown fox jumps over the lazy dog today."),
      Some((1 to 60).map(i => s"word$i").mkString(" ")),
      Some(("the be " + (1 to 60).map(i => s"w$i").mkString(" "))),
      Some("- bullet one\n* bullet two\n\u2022 bullet three\nplain line"),
      Some("ends with dots...\nends with ellipsis\u2026\nno tail"),
      Some("  \tpadded\t  \n\rcrlf line\r\n\u000bvertical\ftab"),
      Some("caf\u00e9 D\u00c9J\u00c0 VU \u0130stanbul STRA\u1e9eE"),
      Some("emoji \ud83d\ude00 pair and \u212aelvin K"),
      Some("THE BE TO OF AND THAT HAVE WITH UPPER"),
      Some("a\u2028b\u2029c\u0085d"),
      Some("one"), Some("x " * 200000))
    val df = bank.toDF("t")
    val u = TextFunctions.gopherMetrics(col("t")).as("u")
    val e = TextFunctions.gopherMetricsExpr(col("t")).as("e")
    val rows = df.select(u, e).collect()
    rows.zip(bank).foreach { case (r, in) =>
      assert(r.getStruct(0) == r.getStruct(1),
        s"UDF != expr on ${in.map(_.take(60))}: ${r.getStruct(0)} vs ${r.getStruct(1)}")
    }
  }
}
