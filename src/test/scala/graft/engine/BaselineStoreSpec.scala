package graft.engine

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Versioned baseline snapshots (ST5 continuous maintenance): write-once
  * version publication, newest-wins merges, legacy seeding, torn-write
  * tolerance, and the recency cap.
  */
class BaselineStoreSpec extends SparkSpec {

  import spark.implicits._

  private def row(p: String, v: Double): (String, Array[Double], Array[Double]) =
    (p, Array(v, 1 - v, 0, 0, 0, 0), Array(v, v, v, v, v))

  private def store() = Files.createTempDirectory("baseline_store").toString

  test("merge seeds from a legacy flat snapshot; newest wins per partition") {
    val dir = store()
    // a legacy flat save-baseline snapshot
    Seq(row("2025-07-01", 0.1), row("2025-07-02", 0.2))
      .toDF("partition", "lang_profile", "len_profile")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(Validator.loadBaseline(spark, dir)("lang").length == 2)
    // fold: replaces 07-02, adds 07-03
    val v = BaselineStore.merge(spark, dir,
      Seq(row("2025-07-02", 0.9), row("2025-07-03", 0.3)))
    assert(v == 0L)
    val rows = BaselineStore.loadRows(spark, dir)
    assert(rows.map(_._1) == Seq("2025-07-01", "2025-07-02", "2025-07-03"))
    assert(rows.find(_._1 == "2025-07-02").get._2(0) == 0.9, "newest must win")
    // loadBaseline resolves the versioned store too (same entry point)
    assert(Validator.loadBaseline(spark, dir)("lang").length == 3)
  }

  test("versions are write-once; prune keeps exactly one version of grace") {
    val dir = store()
    BaselineStore.merge(spark, dir, Seq(row("a", 0.1))) // v0
    BaselineStore.merge(spark, dir, Seq(row("b", 0.2))) // v1 (prunes nothing)
    BaselineStore.merge(spark, dir, Seq(row("c", 0.3))) // v2 (prunes v0)
    val names = Files.list(Paths.get(dir)).iterator()
    val dirs = Iterator.continually(names).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filter(_.startsWith("baseline-v")).toSet
    assert(dirs == Set("baseline-v000000001", "baseline-v000000002"), dirs)
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("a", "b", "c"))
  }

  test("a torn (no _SUCCESS) version is skipped by readers and never collides") {
    val dir = store()
    BaselineStore.merge(spark, dir, Seq(row("a", 0.1))) // v0
    // crashed writer left v1 without _SUCCESS
    val torn = Paths.get(dir, "baseline-v000000001")
    Files.createDirectories(torn)
    Files.write(torn.resolve("part-garbage.parquet"), Array[Byte](9, 9))
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("a"))
    // next merge publishes ABOVE the torn dir
    val v = BaselineStore.merge(spark, dir, Seq(row("b", 0.2)))
    assert(v == 2L, s"expected version 2 above the torn v1, got $v")
    assert(BaselineStore.loadRows(spark, dir).map(_._1) == Seq("a", "b"))
  }

  test("the recency cap retains the GREATEST partition keys (newest days)") {
    val dir = store()
    val many = (1 to 9).map(i => row(f"2025-07-0$i", i / 10.0))
    BaselineStore.merge(spark, dir, many, maxPartitions = 3)
    assert(BaselineStore.loadRows(spark, dir).map(_._1) ==
      Seq("2025-07-07", "2025-07-08", "2025-07-09"))
  }
}
