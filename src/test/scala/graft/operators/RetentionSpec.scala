package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the reference's retention goldens (db_scheduler_test.go via
  * FIXTURES.md §2) and the sessionize/top-k windows.
  */
class RetentionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fiveRows = Seq(
    ("e1", "u1", ts("2025-01-01 00:00:01")),
    ("e1", "u2", ts("2025-01-01 00:00:02")),
    ("e1", "u3", ts("2025-01-01 00:00:03")),
    ("e1", "u4", ts("2025-01-01 00:00:04")),
    ("e1", "u5", ts("2025-01-01 00:00:05"))
  ).toDF("part", "url", "created_at")

  test("count retention: 5 rows, max 3 ⇒ 3 newest kept (db_scheduler_test.go:27-37)") {
    val kept = Retention.byCount(fiveRows, col("part"), col("created_at"), col("url"), 3)
      .select("url").as[String].collect().sorted.toSeq
    assert(kept == Seq("u3", "u4", "u5"))
  }

  test("count retention: 5 rows, max 1 ⇒ 1 newest kept (db_scheduler_test.go:39-49)") {
    val kept = Retention.byCount(fiveRows, col("part"), col("created_at"), col("url"), 1)
      .select("url").as[String].collect().toSeq
    assert(kept == Seq("u5"))
  }

  test("time retention: cutoff drops strictly-older rows") {
    val kept = Retention.byAge(fiveRows, col("created_at"),
      lit("2025-01-01 00:00:03").cast("timestamp"))
      .select("url").as[String].collect().sorted.toSeq
    assert(kept == Seq("u3", "u4", "u5"))
  }

  test("top-k per group ascending = bounded pqueue semantics") {
    val df = Seq(("g1", "a", 5.0), ("g1", "b", 1.0), ("g1", "c", 3.0),
      ("g2", "d", 2.0), ("g2", "e", 9.0)).toDF("g", "id", "dist")
    val top = Retention.topKPerGroup(df, col("g"), col("dist"), col("id"), 2)
      .select("g", "id").as[(String, String)].collect().toSet
    assert(top == Set(("g1", "b"), ("g1", "c"), ("g2", "d"), ("g2", "e")))
  }

  test("global top-k is deterministic with tie-break") {
    val df = Seq(("a", 1.0), ("b", 1.0), ("c", 0.5), ("d", 2.0)).toDF("id", "p")
    val top = Retention.globalTopK(df, col("p"), col("id"), 2)
      .select("id").as[String].collect().toSeq
    assert(top == Seq("c", "a"))
  }

  test("sessionize: gap splits sessions, microsecond-exact") {
    val ev = Seq(
      (1L, ts("2025-01-01 00:00:00")),
      (1L, ts("2025-01-01 00:10:00")), // 600s gap, same session (gap 1800)
      (1L, ts("2025-01-01 01:00:00")), // 3000s gap → new session
      (2L, ts("2025-01-01 00:00:00"))
    ).toDF("user_id", "ts")
    val out = Retention.sessionize(ev, col("user_id"), col("ts"), 1800L)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("session_id")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}
