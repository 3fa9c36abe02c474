package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-budget packing: exact bin math, overflow-by-one rule, oversized
  * docs, shard isolation, determinism.
  */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("bins follow the exclusive-running-sum rule, overflow by at most one doc") {
    // budget 10; shard "a" docs (in key order) of 4, 5, 3, 9, 2 tokens:
    // before-sums 0,4,9,12,21 → bins 0,0,0,1,2 — doc3 (3 tok) STARTS at 9
    // so it stays in bin 0 (the overflow-by-one rule), doc4 starts at 12 →
    // bin 1, doc5 at 21 → bin 2
    val df = Seq(("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 3L),
      ("a", 4L, 9L), ("a", 5L, 2L), ("b", 1L, 25L), ("b", 2L, 1L))
      .toDF("shard", "k", "tok")
    val out = Packing.packByTokenBudget(df, col("shard"), col("k"),
        col("tok"), budget = 10L)
      .select("shard", "k", "bin").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("a", 4L, 1L), ("a", 5L, 2L),
      // an oversized doc (25 > 10) occupies bins 0.. on its own; the NEXT
      // doc starts at 25 → bin 2 — shards pack independently
      ("b", 1L, 0L), ("b", 2L, 2L)), out.toString)
  }

  test("packing is deterministic and partitioning-independent") {
    val df = spark.range(0L, 1000L, 1L, 16)
      .select((col("id") % 3).cast("string").as("shard"), col("id").as("k"),
        (col("id") % 7 + 1).as("tok"))
    val a = Packing.packByTokenBudget(df, col("shard"), col("k"), col("tok"), 50L)
      .select("k", "bin").as[(Long, Long)].collect().toSet
    val b = Packing.packByTokenBudget(df.repartition(3), col("shard"),
        col("k"), col("tok"), 50L)
      .select("k", "bin").as[(Long, Long)].collect().toSet
    assert(a == b, "bin assignment must not depend on input partitioning")
  }

  test("duplicate orderKeys with a tieBreak stay deterministic across partitionings") {
    // two docs share k=7; the tieBreak (unique id) completes the total
    // order, so bin assignment cannot follow physical row order
    val rows = Seq(("a", 7L, 1L, 600L), ("a", 7L, 2L, 10L), ("a", 9L, 3L, 10L))
    val df1 = rows.toDF("shard", "k", "id", "tok")
    val df2 = rows.reverse.toDF("shard", "k", "id", "tok").repartition(4)
    def pack(df: org.apache.spark.sql.DataFrame) =
      Packing.packByTokenBudget(df, col("shard"), col("k"), col("tok"),
          budget = 500L, tieBreak = col("id"))
        .select("id", "bin").as[(Long, Long)].collect().toSet
    val expected = Set((1L, 0L), (2L, 1L), (3L, 1L)) // order (k,id): 600,10,10
    assert(pack(df1) == expected && pack(df2) == expected,
      s"${pack(df1)} vs ${pack(df2)}")
  }

  test("budget must be positive") {
    val df = Seq(("a", 1L, 1L)).toDF("shard", "k", "tok")
    intercept[IllegalArgumentException] {
      Packing.packByTokenBudget(df, col("shard"), col("k"), col("tok"), 0L)
    }
  }
}
