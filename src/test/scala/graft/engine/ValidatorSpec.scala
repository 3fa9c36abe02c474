package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fixtures.WebGen

/** End-to-end: full pass over dirty fixtures; drift days flagged; ledger
  * resume is idempotent and byte-identical (SURVEY §5.2 items 4-5).
  */
class ValidatorSpec extends SparkSpec {

  import spark.implicits._

  private val N = 12000L // ≈ 5+ days at 37s spacing

  test("e2e: dirty fixture produces expected verdict grid") {
    val wp = WebGen.generate(spark, N,
      flags = WebGen.Flags(nullText = true, badExtract = true))
      .withColumnRenamed("p_day", "partition")
    val res = Validator.validate(wp,
      Validator.Config(Validator.DefaultChecks, driftEnabled = false))
    val verdicts = res.verdicts.collect()
    val nParts = wp.select("partition").distinct().count()
    // per-partition rows for each check + 1 global uniqueness row... none here
    assert(verdicts.nonEmpty)
    val nullFailParts = verdicts
      .filter(r => r.getAs[String]("check_name") == "not_null_text" && !r.getAs[Boolean]("passed"))
    assert(nullFailParts.nonEmpty)
    val totalNull = nullFailParts.map(_.getAs[Long]("n_violations")).sum
    assert(totalNull == (0L until N).count(_ % 53 == 0))
    val badExtract = verdicts
      .filter(r => r.getAs[String]("check_name") == "byte_identical_text")
      .map(_.getAs[Long]("n_violations")).sum
    // rows hit by BOTH mutations have NULL text → counted by not_null only
    assert(badExtract == (0L until N).count(i => i % 71 == 0 && i % 53 != 0))
  }

  test("lang drift day flagged by z-score and LOF; clean days pass") {
    val wp = WebGen.generate(spark, N,
      flags = WebGen.Flags(langDriftDay = Some("2025-07-03")))
      .withColumnRenamed("p_day", "partition")
    val res = Validator.validate(wp,
      Validator.Config(checks = Seq(Constraints.NotNull("text"))))
    val drift = res.verdicts
      .where(col("check_name") === "drift_zscore_lang" && col("status") === "scored")
      .select("partition", "passed").as[(String, Boolean)].collect().toMap
    assert(drift.contains("2025-07-03"))
    assert(!drift("2025-07-03"), s"drift day not flagged: $drift")
    val cleanDays = drift.filter(_._1 != "2025-07-03")
    assert(cleanDays.values.forall(identity), s"false positives: $cleanDays")
    val lof = res.verdicts
      .where(col("check_name") === "drift_lof_lang" && col("status") === "scored")
      .select("partition", "passed").as[(String, Boolean)].collect().toMap
    assert(!lof("2025-07-03"), s"LOF missed drift day: $lof")
  }

  test("length drift day flagged via text_length profile") {
    val wp = WebGen.generate(spark, N,
      flags = WebGen.Flags(lenDriftDay = Some("2025-07-04")))
      .withColumnRenamed("p_day", "partition")
    val res = Validator.validate(wp,
      Validator.Config(checks = Seq(Constraints.NotNull("text"))))
    val z = res.verdicts
      .where(col("check_name") === "drift_zscore_text_length" && col("status") === "scored")
      .select("partition", "passed").as[(String, Boolean)].collect().toMap
    assert(!z("2025-07-04"), s"length drift not flagged: $z")
  }

  test("ledger resume: done partitions skipped; re-run produces identical bytes") {
    val tmp = Files.createTempDirectory("ledger").toString
    val out1 = Files.createTempDirectory("out1").toString
    val wp = WebGen.generate(spark, 5000L, flags = WebGen.Flags(nullText = true))
      .withColumnRenamed("p_day", "partition")
    val cfg = Validator.Config(Seq(Constraints.NotNull("text")), driftEnabled = false)

    val ledger = Ledger(tmp)
    val first = Validator.runWithLedger(wp, ledger, "run1", out1, cfg)
    assert(first.nonEmpty)
    // all partitions now done → resume does nothing
    val second = Validator.runWithLedger(wp, ledger, "run2", out1, cfg)
    assert(second.isEmpty)

    // simulate a crash: mark one partition pending again → only it re-runs
    ledger.markPending(first.head, "crash")
    val third = Validator.runWithLedger(wp, ledger, "run3",
      Files.createTempDirectory("out3").toString, cfg)
    assert(third == Seq(first.head))

    // determinism: a fresh full run writes identical violation ids
    val outA = Files.createTempDirectory("outA").toString
    val outB = Files.createTempDirectory("outB").toString
    Validator.runWithLedger(wp, Ledger(Files.createTempDirectory("lA").toString), "a", outA, cfg)
    Validator.runWithLedger(wp, Ledger(Files.createTempDirectory("lB").toString), "b", outB, cfg)
    val va = spark.read.parquet(s"$outA/violations")
      .orderBy("violation_id").select("violation_id").as[String].collect().toSeq
    val vb = spark.read.parquet(s"$outB/violations")
      .orderBy("violation_id").select("violation_id").as[String].collect().toSeq
    assert(va == vb && va.nonEmpty)
  }

  test("ledger resume works identically on the single-file JSONL backend") {
    val log = Files.createTempDirectory("ledger_jsonl").toString + "/run.jsonl"
    val out = Files.createTempDirectory("out_jsonl").toString
    val wp = WebGen.generate(spark, 5000L, flags = WebGen.Flags(nullText = true))
      .withColumnRenamed("p_day", "partition")
    val cfg = Validator.Config(Seq(Constraints.NotNull("text")), driftEnabled = false)
    val ledger = Ledger(log)
    assert(ledger.isInstanceOf[LogLedger])
    val first = Validator.runWithLedger(wp, ledger, "run1", out, cfg)
    assert(first.nonEmpty)
    assert(Validator.runWithLedger(wp, ledger, "run2", out, cfg).isEmpty)
    ledger.markPending(first.head, "crash")
    val third = Validator.runWithLedger(wp, ledger, "run3", out, cfg)
    assert(third == Seq(first.head))
  }

  test("ledger resume into the SAME outDir preserves done partitions' outputs") {
    val tmp = Files.createTempDirectory("ledger_same").toString
    val out = Files.createTempDirectory("out_same").toString
    val wp = WebGen.generate(spark, 5000L, flags = WebGen.Flags(nullText = true))
      .withColumnRenamed("p_day", "partition")
    val cfg = Validator.Config(Seq(Constraints.NotNull("text")), driftEnabled = false)
    val ledger = Ledger(tmp)

    val first = Validator.runWithLedger(wp, ledger, "run1", out, cfg)
    assert(first.size > 1)

    val keep = first.head // a partition that stays `done` through the resume
    def violIds(p: String): Seq[String] =
      spark.read.parquet(s"$out/violations").where(col("partition") === p)
        .orderBy("violation_id").select("violation_id").as[String].collect().toSeq
    def verdictCnt(p: String): Long =
      spark.read.parquet(s"$out/verdicts").where(col("partition") === p).count()
    val violBefore = violIds(keep)
    val verdictBefore = verdictCnt(keep)
    assert(violBefore.nonEmpty && verdictBefore > 0)

    // crash: the LAST partition goes pending again → resume into the SAME out
    val crashed = first.last
    ledger.markPending(crashed, "crash")
    val rerun = Validator.runWithLedger(wp, ledger, "run2", out, cfg)
    assert(rerun == Seq(crashed))

    // the untouched done partition's outputs survive byte-identical
    assert(violIds(keep) == violBefore,
      "resume destroyed a done partition's violations")
    assert(verdictCnt(keep) == verdictBefore,
      "resume destroyed a done partition's verdicts")
    // and the re-run partition's outputs are present exactly once
    assert(verdictCnt(crashed) > 0)
    val reViol = spark.read.parquet(s"$out/violations")
      .where(col("partition") === crashed).select("violation_id").as[String].collect()
    assert(reViol.distinct.length == reViol.length, "replayed partition duplicated rows")
    // stats side too: every first-run partition still has its column_stats row
    val statParts = spark.read.parquet(s"$out/column_stats")
      .select("partition").as[String].collect().toSet
    assert(first.toSet.subsetOf(statParts))
  }

  test("resume recomputes GLOBAL uniqueness over the full table, not the pending subset") {
    import java.sql.Timestamp
    val out = Files.createTempDirectory("out_glob").toString
    val ledgerDir = Files.createTempDirectory("ledger_glob").toString
    def page(p: String, u: String, t: String) =
      (p, u, Timestamp.valueOf(s"$t"), s"<html><body><p>x</p></body></html>".getBytes("UTF-8"), "x", "en")
    // one url duplicated ACROSS partitions A and B; plus unique fillers
    val rows = Seq(
      page("A", "https://dup/1", "2025-07-01 00:00:00"),
      page("A", "https://a/2", "2025-07-01 00:00:01"),
      page("A", "https://a/3", "2025-07-01 00:00:02"),
      page("B", "https://dup/1", "2025-07-02 00:00:00"),
      page("B", "https://b/2", "2025-07-02 00:00:01"),
      page("B", "https://b/3", "2025-07-02 00:00:02"))
    val wp = rows.toDF("partition", "url", "warc_ts", "html", "text", "lang")
    val cfg = Validator.Config(Seq(Constraints.Unique("url")), driftEnabled = false)
    val ledger = Ledger(ledgerDir)
    val first = Validator.runWithLedger(wp, ledger, "r1", out, cfg)
    assert(first.sorted == Seq("A", "B"))
    def globalDups() = spark.read.parquet(s"$out/violations")
      .where(col("partition") === "<global>").select("url").as[String].collect().toSeq
    assert(globalDups() == Seq("https://dup/1"))
    // crash B → resume: the pending subset (B alone) contains no duplicate,
    // but the table still does — the cross-partition violation must survive
    ledger.markPending("B", "crash")
    val rerun = Validator.runWithLedger(wp, ledger, "r2", out, cfg)
    assert(rerun == Seq("B"))
    assert(globalDups() == Seq("https://dup/1"),
      "cross-partition duplicate vanished after resuming a subset")
  }

  test("ST5 append policy: violating rows are excluded from the baseline model") {
    val wp = WebGen.generate(spark, 3000L, flags = WebGen.Flags(nullText = true))
      .withColumnRenamed("p_day", "partition")
    val withPolicy = Files.createTempDirectory("base_policy").toString
    val manual = Files.createTempDirectory("base_manual").toString
    Validator.saveBaseline(wp, withPolicy, Seq(Constraints.NotNull("text")))
    Validator.saveBaseline(wp.where(col("text").isNotNull), manual)
    val a = Validator.loadBaseline(spark, withPolicy)
    val b = Validator.loadBaseline(spark, manual)
    // lang profiles are exact fractions → must be identical
    assert(a("lang").map(_.toSeq) == b("lang").map(_.toSeq),
      "append-policy lang profile must equal a manually pre-filtered baseline")
    // length profiles come from KLL sketches whose compaction is randomized
    // above k entries → equal within the sketch's rank-error bound (bound
    // chosen well under the ~1.0 drift-day deltas the scorers act on;
    // typical run-to-run wobble is ~0.05 but the randomized compaction has
    // a long tail — 0.2 was observed to flake about once per hundred runs)
    a("text_length").zip(b("text_length")).foreach { case (qa, qb) =>
      qa.zip(qb).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 0.35, s"quantile drifted: $x vs $y")
      }
    }
  }

  test("resume drift is scored against the FULL table's peer profiles") {
    // drift-vs-peers is a cross-partition property (same argument as global
    // uniqueness): a resumed partition must see the same leave-one-out peer
    // set as an unresumed run. Peers come from the persisted column_stats of
    // done partitions — no input rescan. Pre-fix, the resumed partition was
    // scored against the pending subset only and its drift verdict silently
    // changed (the drift day UNFLAGGED itself on resume).
    val tmp = Files.createTempDirectory("ledger_drift").toString
    val out = Files.createTempDirectory("out_drift").toString
    val wp = WebGen.generate(spark, N,
      flags = WebGen.Flags(langDriftDay = Some("2025-07-03")))
      .withColumnRenamed("p_day", "partition")
    val cfg = Validator.Config(Seq(Constraints.NotNull("text")))
    val ledger = Ledger(tmp)
    Validator.runWithLedger(wp, ledger, "run1", out, cfg)
    def langVerdicts() = spark.read.parquet(s"$out/verdicts")
      .where(col("check_name") === "drift_zscore_lang") // lang: exact, KLL-free
      .select("partition", "passed", "score")
      .as[(String, Boolean, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val fresh = langVerdicts()
    // crash: the DRIFT DAY itself goes pending; resume into the same outDir
    ledger.markPending("2025-07-03", "crash")
    val rerun = Validator.runWithLedger(wp, ledger, "run2", out, cfg)
    assert(rerun == Seq("2025-07-03"))
    val resumed = langVerdicts()
    assert(resumed == fresh,
      s"resume changed lang drift verdicts:\nfresh=$fresh\nresumed=$resumed")
    assert(!resumed("2025-07-03")._1, "drift day lost its flag on resume")
  }

  test("manifest commit mode: ledger resume + drift peers end-to-end via readTable") {
    // the object-store deploy shape: every output table commits via the
    // manifest pointer. Resume must (a) skip done partitions, (b) read done
    // partitions' column_stats back THROUGH the manifest for the drift peer
    // pool (a plain parquet read sees nothing under a manifest table and
    // would silently empty the peers), (c) keep verdicts byte-stable.
    spark.conf.set(TableIO.CommitModeConf, "manifest")
    try {
      val tmp = Files.createTempDirectory("ledger_manifest").toString
      val out = Files.createTempDirectory("out_manifest").toString
      val wp = WebGen.generate(spark, N,
        flags = WebGen.Flags(langDriftDay = Some("2025-07-03")))
        .withColumnRenamed("p_day", "partition")
      val cfg = Validator.Config(Seq(Constraints.NotNull("text")))
      val ledger = Ledger(tmp)
      Validator.runWithLedger(wp, ledger, "run1", out, cfg)
      def langVerdicts() = TableIO.readTable(spark, s"$out/verdicts")
        .where(col("check_name") === "drift_zscore_lang")
        .select("partition", "passed", "score")
        .as[(String, Boolean, Double)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      val fresh = langVerdicts()
      assert(!fresh("2025-07-03")._1, "drift day not flagged under manifest mode")
      ledger.markPending("2025-07-03", "crash")
      val rerun = Validator.runWithLedger(wp, ledger, "run2", out, cfg)
      assert(rerun == Seq("2025-07-03"))
      assert(langVerdicts() == fresh,
        "manifest-mode resume changed drift verdicts (empty peer pool?)")
    } finally spark.conf.unset(TableIO.CommitModeConf)
  }

  test("repeated validate + unpersist leaves no cached RDDs behind") {
    // the long-lived-driver (`ingest` loop) shape: each pass caches its
    // stats/violations; Result.unpersist must release them or executor
    // memory grows per pass
    val wp = WebGen.generate(spark, 2000L).withColumnRenamed("p_day", "partition")
    var baseline = -1
    (1 to 3).foreach { _ =>
      val res = Validator.validate(wp, Validator.Config(Validator.DefaultChecks))
      res.verdicts.count()
      res.violations.count()
      res.unpersist()
      val now = spark.sparkContext.getPersistentRDDs.size
      if (baseline < 0) baseline = now
      assert(now == baseline, s"cached RDDs grew across passes: $baseline → $now")
    }
  }

  test("warm-up: partitions under minRowsToScore get skipped drift verdicts") {
    val wp = WebGen.generate(spark, 3000L).withColumnRenamed("p_day", "partition")
    val res = Validator.validate(wp,
      Validator.Config(checks = Seq(Constraints.NotNull("text")),
        minRowsToScore = 100000L))
    val statuses = res.verdicts.where(col("check_name").startsWith("drift_"))
      .select("status").distinct().as[String].collect().toSet
    assert(statuses == Set("skipped"))
  }

  test("a throwing drift scorer fails the pass with ITS cause, not a downstream NPE") {
    // pre-fix: raw worker Threads swallowed the throwable, left null out(i)
    // slots, and the pass died later with a bare NPE hiding the real error
    val wp = WebGen.generate(spark, 800L).withColumnRenamed("p_day", "partition")
    val boom = new Drift.Scorer {
      val name = "drift_boom"
      def score(current: Array[Double],
          baseline: IndexedSeq[Array[Double]]): Drift.DriftVerdict =
        throw new IllegalStateException("scorer exploded")
    }
    val e = intercept[RuntimeException] {
      Validator.validate(wp,
        Validator.Config(checks = Seq(Constraints.NotNull("text")),
          scorers = Some(Seq(boom))))
    }
    assert(e.getMessage.contains("drift scorer failed"), e.getMessage)
    assert(e.getCause.isInstanceOf[IllegalStateException] &&
      e.getCause.getMessage == "scorer exploded", String.valueOf(e.getCause))
  }
}
