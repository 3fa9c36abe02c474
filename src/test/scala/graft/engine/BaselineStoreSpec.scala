package graft.engine

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Versioned baseline snapshots (ST5 continuous maintenance): write-once
  * version publication, MERGEABLE accumulation, legacy seeding, torn-write
  * tolerance, and the recency cap.
  */
class BaselineStoreSpec extends SparkSpec {

  import spark.implicits._

  private def sk(values: Double*): Array[Byte] = {
    val s = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    values.foreach(s.update)
    s.toByteArray
  }

  /** A mergeable model row as the streaming fold produces it. */
  private def mrow(p: String, v: Double, cnt: Long = 100L,
      lenValues: Seq[Double] = Seq(1.0, 2.0, 3.0))
      : (String, Long, Array[Double], Array[Byte]) =
    (p, cnt, Array(v, 1 - v, 0, 0, 0, 0), sk(lenValues: _*))

  /** A legacy flat-snapshot row (no merge state). */
  private def legacyRow(p: String, v: Double): (String, Array[Double], Array[Double]) =
    (p, Array(v, 1 - v, 0, 0, 0, 0), Array(v, v, v, v, v))

  private def store() = Files.createTempDirectory("baseline_store").toString

  test("merge seeds from a legacy flat snapshot; live folds replace seed entries") {
    val dir = store()
    Seq(legacyRow("2025-07-01", 0.1), legacyRow("2025-07-02", 0.2))
      .toDF("partition", "lang_profile", "len_profile")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(Validator.loadBaseline(spark, dir)("lang").length == 2)
    val v = BaselineStore.merge(spark, dir,
      Seq(mrow("2025-07-02", 0.9), mrow("2025-07-03", 0.3)))
    assert(v == 0L)
    val rows = BaselineStore.loadRows(spark, dir)
    assert(rows.map(_._1) == Seq("2025-07-01", "2025-07-02", "2025-07-03"))
    // the legacy seed for 07-02 carried no merge state → replaced outright
    assert(rows.find(_._1 == "2025-07-02").get._2(0) == 0.9)
    // loadBaseline resolves the versioned store too (same entry point)
    assert(Validator.loadBaseline(spark, dir)("lang").length == 3)
  }

  test("accumulation is row-count-weighted and sketch-merging, not last-slice-wins") {
    // a day split across micro-batches (the default trigger bound
    // guarantees this) must fold into a WHOLE-DAY model: lang fractions
    // combine weighted by row count, length quantiles come off the UNION
    // of the slices' sketches
    val dir = store()
    BaselineStore.merge(spark, dir,
      Seq(mrow("2025-07-01", 0.1, cnt = 100L, lenValues = Seq.fill(100)(2.0))))
    BaselineStore.merge(spark, dir,
      Seq(mrow("2025-07-01", 0.5, cnt = 300L, lenValues = Seq.fill(300)(10.0))))
    val r = BaselineStore.loadRows(spark, dir)
    assert(r.map(_._1) == Seq("2025-07-01"))
    val lang0 = r.head._2(0)
    assert(math.abs(lang0 - 0.4) < 1e-9, // (0.1*100 + 0.5*300) / 400
      s"lang fraction must be count-weighted: got $lang0")
    val len = r.head._3 // quantiles of the MERGED sketch (100×2.0, 300×10.0)
    assert(len(0) == 2.0, s"q05 of the union must see the first slice: ${len.toSeq}")
    assert(len(2) == 10.0, s"median of the union must be the dominant slice: ${len.toSeq}")
  }

  test("merge with a dedupKey is at-most-once: a replayed micro-batch fold is skipped") {
    // foreachBatch is at-least-once — without the key, a replayed batch
    // would double-count its rows and permanently under-weight later
    // slices of the same day
    val dir = store()
    val slice = Seq(mrow("a", 0.1, cnt = 100L, lenValues = Seq.fill(10)(2.0)))
    assert(BaselineStore.merge(spark, dir, slice, dedupKey = Some("q1/7")) == 0L)
    assert(BaselineStore.merge(spark, dir, slice, dedupKey = Some("q1/7")) == -1L,
      "replayed (lineage, batch) must not fold twice")
    // a genuinely new batch folds, and the weighting reflects ONE copy of
    // the first slice
    assert(BaselineStore.merge(spark, dir,
      Seq(mrow("a", 0.5, cnt = 100L, lenValues = Seq.fill(10)(4.0))),
      dedupKey = Some("q1/8")) == 1L)
    val lang0 = BaselineStore.loadRows(spark, dir).head._2(0)
    assert(math.abs(lang0 - 0.3) < 1e-9, // (0.1*100 + 0.5*100) / 200
      s"replay leaked into the weighting: $lang0")
  }

  test("a fold that failed BEFORE publishing leaves no key: the retry folds cleanly") {
    // the transactional property the in-version dedup buys: dedup record
    // and data publish atomically, so a transient failure never converts
    // into permanent slice loss
    val dir = store()
    BaselineStore.merge(spark, dir, Seq(mrow("a", 0.1)), dedupKey = Some("q1/1"))
    // simulate: fold of batch 2 crashed mid-publish — torn version dir,
    // no _SUCCESS, therefore no folded key recorded anywhere
    val torn = Paths.get(dir, "baseline-v000000001")
    Files.createDirectories(torn)
    Files.write(torn.resolve("part-dead.parquet"), Array[Byte](9))
    // the retry with the SAME dedup key must fold (not be misread as a
    // replay) and publish above the torn dir
    val v = BaselineStore.merge(spark, dir, Seq(mrow("b", 0.2)),
      dedupKey = Some("q1/2"))
    assert(v == 2L, s"retry after torn publish must fold, got $v")
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("a", "b"))
  }

  test("interim _folded-* marker files are honored on upgrade, then retired") {
    val dir = store()
    BaselineStore.merge(spark, dir, Seq(mrow("a", 0.1)), dedupKey = Some("q1/1"))
    // a marker left by the interim revision for a batch whose fold
    // published pre-folded_keys: its replay must still be skipped
    Files.write(Paths.get(dir, "_folded-" +
      java.net.URLEncoder.encode("q1/2", "UTF-8")), Array.emptyByteArray)
    assert(BaselineStore.merge(spark, dir, Seq(mrow("a", 0.9)),
      dedupKey = Some("q1/2")) == -1L, "marker-recorded fold replayed")
    // a later genuine fold retires the markers
    assert(BaselineStore.merge(spark, dir, Seq(mrow("b", 0.2)),
      dedupKey = Some("q1/3")) >= 0L)
    val names = Files.list(Paths.get(dir)).iterator()
    val left = Iterator.continually(names).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filter(_.startsWith("_folded-")).toSeq
    assert(left.isEmpty, s"stale markers not retired: $left")
  }

  test("versions are write-once; prune keeps exactly one version of grace") {
    val dir = store()
    BaselineStore.merge(spark, dir, Seq(mrow("a", 0.1))) // v0
    BaselineStore.merge(spark, dir, Seq(mrow("b", 0.2))) // v1 (prunes nothing)
    BaselineStore.merge(spark, dir, Seq(mrow("c", 0.3))) // v2 (prunes v0)
    val names = Files.list(Paths.get(dir)).iterator()
    val dirs = Iterator.continually(names).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filter(_.startsWith("baseline-v")).toSet
    assert(dirs == Set("baseline-v000000001", "baseline-v000000002"), dirs)
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("a", "b", "c"))
  }

  test("a torn (no _SUCCESS) version is skipped by readers and never collides") {
    val dir = store()
    BaselineStore.merge(spark, dir, Seq(mrow("a", 0.1))) // v0
    val torn = Paths.get(dir, "baseline-v000000001")
    Files.createDirectories(torn)
    Files.write(torn.resolve("part-garbage.parquet"), Array[Byte](9, 9))
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("a"))
    val v = BaselineStore.merge(spark, dir, Seq(mrow("b", 0.2)))
    assert(v == 2L, s"expected version 2 above the torn v1, got $v")
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("a", "b"))
  }

  test("torn FIRST version beside a legacy flat snapshot does not poison the read") {
    // the crash window: legacy flat seed present, the very first merge died
    // between the parquet job and the _SUCCESS write. A naive
    // read-the-root would hit parquet's conflicting-directory-structures
    // error and wedge every stream start until manual cleanup.
    val dir = store()
    Seq(legacyRow("2025-07-01", 0.1))
      .toDF("partition", "lang_profile", "len_profile")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val torn = Paths.get(dir, "baseline-v000000000")
    Files.createDirectories(torn)
    // real parquet DATA file (not just garbage bytes) inside the torn dir —
    // exactly what a crashed committer leaves
    Seq(legacyRow("2025-07-09", 0.9))
      .toDF("partition", "lang_profile", "len_profile")
      .coalesce(1).write.mode("overwrite").parquet(torn.resolve("stage").toString)
    val part = Files.list(torn.resolve("stage")).iterator()
    Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(f => Files.copy(f, torn.resolve(f.getFileName)))
    // readers serve the legacy seed, undisturbed by the torn dir
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("2025-07-01"))
    // and the next merge publishes ABOVE the torn version
    assert(BaselineStore.merge(spark, dir, Seq(mrow("2025-07-02", 0.2))) == 1L)
    assert(BaselineStore.loadRows(spark, dir).map(_._1) ==
      Seq("2025-07-01", "2025-07-02"))
  }

  test("the recency cap retains the GREATEST partition keys (newest days)") {
    val dir = store()
    val many = (1 to 9).map(i => mrow(f"2025-07-0$i", i / 10.0))
    BaselineStore.merge(spark, dir, many, maxPartitions = 3)
    assert(BaselineStore.loadRows(spark, dir).map(_._1) ==
      Seq("2025-07-07", "2025-07-08", "2025-07-09"))
  }

  test("the null-key catch-all never enters or leaves the model, in either spelling") {
    val dir = store()
    // a legacy flat snapshot polluted BEFORE the exclusion existed: both a
    // "<unknown>" sentinel row and a literal-null row (library caller that
    // skipped the coalesce) sit in the store
    Seq(legacyRow("2025-07-01", 0.1),
        legacyRow(Validator.UnknownPartition, 0.9),
        legacyRow(null, 0.8))
      .toDF("partition", "lang_profile", "len_profile")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // read side: neither spelling is ever served as a baseline
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("2025-07-01"))
    // fold side: catch-all input rows are dropped, real rows fold, and the
    // pre-existing pollution washes out of the committed version
    val v = BaselineStore.merge(spark, dir,
      Seq(mrow("2025-07-02", 0.3), mrow(Validator.UnknownPartition, 0.7),
        mrow(null, 0.6)))
    assert(v == 0L)
    assert(BaselineStore.loadRows(spark, dir).map(_._1) ==
      Seq("2025-07-01", "2025-07-02"))
    // a batch with ONLY catch-all rows commits nothing and records no
    // dedup key — a later real batch under the same key must still fold
    val none = BaselineStore.merge(spark, dir,
      Seq(mrow(Validator.UnknownPartition, 0.5)), dedupKey = Some("L/7"))
    assert(none == -1L)
    val later = BaselineStore.merge(spark, dir,
      Seq(mrow("2025-07-03", 0.2)), dedupKey = Some("L/7"))
    assert(later == 1L, s"key must not have been burned by the no-op: $later")
    assert(BaselineStore.loadRows(spark, dir).map(_._1) ==
      Seq("2025-07-01", "2025-07-02", "2025-07-03"))
  }
}
