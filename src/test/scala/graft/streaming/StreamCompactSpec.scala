package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.engine.{TextExtract, WebPage}

/** Roll-up compaction of the streaming sink's per-micro-batch dirs:
  * row preservation, replay-window safety, crash recovery, id reservation,
  * and reconciliation-semantics preservation.
  */
class StreamCompactSpec extends SparkSpec {

  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private def page(i: Int, day: String = "2025-07-01"): WebPage =
    WebPage(s"https://e.org/$i", Timestamp.valueOf(s"$day 00:00:00"),
      TextExtract.wrapHtml("x"), "x", "en")

  /** Seed one committed micro-batch exactly as the sink writes it. */
  private def seed(out: String, lineage: String, batchId: Long,
      pages: Seq[WebPage], crossBatch: Boolean = false): Unit =
    StreamingValidate.writeValidatedBatch(pages.toDF(), out, lineage, batchId,
      crossBatchUnique = crossBatch)

  private def batchDirs(table: String): Seq[String] =
    Files.list(Paths.get(table)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("lineage="))
      .flatMap(l => Files.list(l).iterator().asScala)
      .map(_.getFileName.toString).toSeq.sorted

  private def pagesKey(df: DataFrame): Set[(String, String, Long)] =
    df.select($"url", $"lineage", $"ingest_batch".cast("long"))
      .as[(String, String, Long)].collect().toSet

  test("roll-up preserves every row, spares the newest k dirs, and records provenance") {
    val out = Files.createTempDirectory("compact_basic").toString
    (0L to 4L).foreach(b => seed(out, "q1",
      b, Seq(page(b.toInt * 2), page(b.toInt * 2 + 1))))
    val before = spark.read.parquet(s"$out/pages")
      .select("url", "text", "lang", "partition").as[(String, String, String, String)]
      .collect().sorted.toSeq
    val res = StreamCompact.compactAll(spark, out) // keepBatches = 2
    val pagesRes = res.find(_.table == "pages").get
    assert(pagesRes.compactedLineages == 1 && pagesRes.absorbedDirs == 3,
      pagesRes.summary)
    // batches 0..2 rolled into ingest_batch=-1; 3 and 4 untouched
    assert(batchDirs(s"$out/pages") ==
      Seq("ingest_batch=-1", "ingest_batch=3", "ingest_batch=4"))
    val after = spark.read.parquet(s"$out/pages")
    assert(after.select("url", "text", "lang", "partition")
      .as[(String, String, String, String)].collect().sorted.toSeq == before,
      "compaction must preserve every data row byte-for-byte")
    // absorbed rows read back under the roll-up id; live rows keep theirs
    assert(pagesKey(after) == (0 to 5).map(i => (s"https://e.org/$i", "q1", -1L)).toSet
      ++ (6 to 9).map(i => (s"https://e.org/$i", "q1", (i / 2).toLong)),
      pagesKey(after).toString)
    // dir-level provenance rides inside the roll-up
    val rec = Files.readAllLines(
      Paths.get(s"$out/pages/lineage=q1/ingest_batch=-1/_compacted_sources"))
      .asScala.toSeq
    assert(rec == Seq("ingest_batch=0", "ingest_batch=1", "ingest_batch=2"), rec)
    // verdict tree compacted too, and still readable
    assert(spark.read.parquet(s"$out/verdicts").count() > 0)
  }

  test("re-compaction absorbs the prior roll-up and never reuses an id") {
    val out = Files.createTempDirectory("compact_rollup").toString
    (0L to 3L).foreach(b => seed(out, "q1", b, Seq(page(b.toInt))))
    StreamCompact.compactAll(spark, out, keepBatches = 1) // -1 <= [0,1,2]
    (4L to 5L).foreach(b => seed(out, "q1", b, Seq(page(b.toInt))))
    StreamCompact.compactAll(spark, out, keepBatches = 1) // -2 <= [-1,3,4]
    assert(batchDirs(s"$out/pages") == Seq("ingest_batch=-2", "ingest_batch=5"))
    assert(spark.read.parquet(s"$out/pages").select("url").as[String]
      .collect().sorted.toSeq == (0 to 5).map(i => s"https://e.org/$i"))
    // a third run with nothing new to absorb is a no-op (no churn)
    val res3 = StreamCompact.compactAll(spark, out, keepBatches = 1)
    assert(res3.find(_.table == "pages").get.compactedLineages == 0)
    assert(batchDirs(s"$out/pages") == Seq("ingest_batch=-2", "ingest_batch=5"))
  }

  test("crash between commit and source deletion: recovery converges with no loss or double") {
    val out = Files.createTempDirectory("compact_crash").toString
    (0L to 2L).foreach(b => seed(out, "q1", b, Seq(page(b.toInt))))
    val src = Paths.get(s"$out/pages/lineage=q1/ingest_batch=0")
    val stash = Files.createTempDirectory("stash").resolve("ingest_batch=0")
    copyTree(src, stash)
    StreamCompact.compactAll(spark, out, keepBatches = 1)
    // simulate the crash window: the roll-up committed but this source's
    // deletion never ran — restore it; rows now visible TWICE (never lost)
    copyTree(stash, src)
    assert(spark.read.parquet(s"$out/pages")
      .where($"url" === "https://e.org/0").count() == 2)
    // a DRY run over the crash state must count the recovery, EXCLUDE the
    // leftover source from its absorb plan (the recoveredNames mirror of
    // the real sweep), and change nothing on disk
    val dry = StreamCompact.compactAll(spark, out, keepBatches = 1,
      dryRun = true).find(_.table == "pages").get
    assert(dry.recoveredDeletes == 1, dry.summary)
    assert(Files.exists(src), "dry run must not delete the leftover source")
    val res = StreamCompact.compactAll(spark, out, keepBatches = 1)
    val rp = res.find(_.table == "pages").get
    assert(rp.recoveredDeletes == 1, res.map(_.summary).toString)
    assert(rp.compactedLineages == dry.compactedLineages &&
      rp.absorbedDirs == dry.absorbedDirs,
      s"dry=${dry.summary} real=${rp.summary}")
    assert(spark.read.parquet(s"$out/pages").select("url").as[String]
      .collect().sorted.toSeq == (0 to 2).map(i => s"https://e.org/$i"),
      "recovery must delete the leftover source exactly once")
  }

  test("orphan staging dirs (crash before the commit rename) are swept") {
    val out = Files.createTempDirectory("compact_staging").toString
    (0L to 1L).foreach(b => seed(out, "q1", b, Seq(page(b.toInt))))
    val orphan = Paths.get(s"$out/pages/.compact-staging-dead")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1, 2))
    val res = StreamCompact.compactAll(spark, out)
    assert(res.find(_.table == "pages").get.sweptStagings == 1)
    assert(Files.notExists(orphan))
    // the sink still writes cleanly beside the compacted tree
    seed(out, "q1", 2L, Seq(page(9)))
    assert(spark.read.parquet(s"$out/pages").count() == 3)
  }

  test("cross-batch duplicate detection still flags urls that live in a roll-up") {
    val out = Files.createTempDirectory("compact_seen").toString
    seed(out, "q1", 0L, Seq(page(0), page(1)), crossBatch = true)
    seed(out, "q1", 1L, Seq(page(2)), crossBatch = true)
    seed(out, "q1", 2L, Seq(page(3)), crossBatch = true)
    StreamCompact.compactAll(spark, out, keepBatches = 1) // 0,1 -> roll-up
    // a NEW batch re-sends url 0 (now only present inside the roll-up)
    seed(out, "q1", 3L, Seq(page(0)), crossBatch = true)
    val seen = spark.read.parquet(s"$out/violations")
      .where($"check_name" === graft.engine.Constraints.SeenPriorBatch.name)
    assert(seen.select("url").as[String].collect().toSeq ==
      Seq("https://e.org/0"),
      "roll-up rows must still count as prior batches for reconciliation")
  }

  test("object-store schemes are refused before any mutation (rename is not atomic there)") {
    val e = intercept[IllegalArgumentException] {
      StreamCompact.compactTable(spark, "s3a://bucket/out/pages", "pages",
        keepBatches = 2, targetFileBytes = 1L << 27)
    }
    assert(e.getMessage.contains("not atomic"), e.getMessage)
  }

  test("dry run mutates nothing and predicts the real run's counts") {
    val out = Files.createTempDirectory("compact_dry").toString
    (0L to 4L).foreach(b => seed(out, "q1", b, Seq(page(b.toInt))))
    val orphan = Paths.get(s"$out/pages/.compact-staging-dead")
    Files.createDirectories(orphan)
    val before = batchDirs(s"$out/pages")
    val dry = StreamCompact.compactAll(spark, out, keepBatches = 1,
      dryRun = true)
    val dp = dry.find(_.table == "pages").get
    assert(dp.compactedLineages == 1 && dp.absorbedDirs == 4 &&
      dp.sweptStagings == 1, dp.summary)
    // NOTHING changed: same dirs, orphan staging still present
    assert(batchDirs(s"$out/pages") == before && Files.exists(orphan))
    // the real run delivers exactly the dry run's absorb counts
    val real = StreamCompact.compactAll(spark, out, keepBatches = 1)
    val rp = real.find(_.table == "pages").get
    assert(rp.compactedLineages == dp.compactedLineages &&
      rp.absorbedDirs == dp.absorbedDirs &&
      rp.absorbedFiles == dp.absorbedFiles,
      s"dry=${dp.summary} real=${rp.summary}")
    assert(batchDirs(s"$out/pages") == Seq("ingest_batch=-1", "ingest_batch=4"))
  }

  test("a missing or empty tree is a zero no-op, not an error") {
    val out = Files.createTempDirectory("compact_empty").toString
    val res = StreamCompact.compactAll(spark, out)
    assert(res.forall(r => r.compactedLineages == 0 && r.absorbedDirs == 0))
  }

  private def copyTree(from: Path, to: Path): Unit = {
    Files.walk(from).iterator().asScala.foreach { p =>
      val dest = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else { Files.createDirectories(dest.getParent); Files.copy(p, dest) }
    }
  }
}
