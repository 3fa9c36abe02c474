package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fixtures.WebGen

class StatsPassSpec extends SparkSpec {

  import spark.implicits._

  private def wp = WebGen.generate(spark, 3000)
    .withColumnRenamed("p_day", "partition")

  test("statsAndProfiles: one agg yields counts, profiles and sketches") {
    val s = StatsPass.statsAndProfiles(wp).cache()
    assert(s.agg(sum("row_cnt")).collect().head.getLong(0) == 3000)
    val row = s.orderBy("partition").collect().head
    val lang = row.getSeq[Double](row.fieldIndex("lang_profile"))
    assert(lang.length == 6 && math.abs(lang.sum - 1.0) < 1e-9)
    val sk = row.getAs[Array[Byte]]("len_kll_sketch")
    assert(graft.engine.sketch.KllAgg.count(sk) == row.getAs[Long]("row_cnt"))
    s.unpersist()
  }

  test("per-partition HLL sketches union to the global distinct count (resume path)") {
    val s = StatsPass.statsAndProfiles(wp)
    // union the per-partition sketches without touching the data again —
    // exactly what a ledger-resumed run does to get table-level cardinality
    val merged = s.agg(
      hll_union_agg(col("url_hll_sketch")).as("u"))
      .select(hll_sketch_estimate(col("u"))).collect().head.getLong(0)
    val exact = wp.select(countDistinct(col("url"))).collect().head.getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL union estimate $merged vs exact $exact")
  }

  test("narrow stats view stacks per-stat rows") {
    val n = StatsPass.narrow(StatsPass.partitionStats(wp))
    assert(n.select("stat").distinct().count() == 6)
  }

  test("lang profiles have fixed category order") {
    val p = StatsPass.langProfiles(wp).orderBy("partition").collect().head
    val arr = p.getSeq[Double](1)
    assert(arr.length == 6)
    // en is the dominant class in the clean fixture (~0.62)
    assert(arr.head > 0.5, s"p(en)=${arr.head}")
  }
}
