package graft.engine.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KllAggSpec extends SparkSpec {

  import spark.implicits._

  test("KLL sketch quantiles approximate exact quantiles") {
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val sk = df.groupBy(col("g"))
      .agg(KllAgg.kllSketch(col("v").cast("double")).as("sk"))
      .select("sk").as[Array[Byte]].collect().head
    val q50 = KllAgg.quantile(sk, 0.5)
    assert(math.abs(q50 - 5000) < 200, s"q50=$q50")
    assert(KllAgg.count(sk) == 10000)
  }

  test("per-partition sketches merge to the global sketch (resume semantics)") {
    val df = (1 to 9000).map(i => (s"p${i % 3}", i.toDouble)).toDF("p", "v")
    val parts = df.groupBy(col("p"))
      .agg(KllAgg.kllSketch(col("v").cast("double")).as("sk"))
      .select("sk").as[Array[Byte]].collect()
    assert(parts.length == 3)
    val merged = KllAgg.mergeAll(parts)
    assert(KllAgg.count(merged) == 9000)
    val q50 = KllAgg.quantile(merged, 0.5)
    assert(math.abs(q50 - 4500) < 200, s"merged q50=$q50")
  }

  test("nulls are ignored; empty group yields empty sketch") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)), ("h", None))
      .toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(KllAgg.kllSketch(col("v")).as("sk"))
      .select("g", "sk").as[(String, Array[Byte])].collect().toMap
    assert(KllAgg.count(out("g")) == 2)
    assert(KllAgg.count(out("h")) == 0)
    assert(KllAgg.quantile(out("h"), 0.5).isNaN)
  }

  test("merge is associative-ish: split order does not change rank queries") {
    val vals = (1 to 5000).map(_.toDouble)
    val a = KllAgg.mergeAll(Seq(sketchOf(vals.take(2500)), sketchOf(vals.drop(2500))))
    val b = KllAgg.mergeAll(Seq(sketchOf(vals.drop(2500)), sketchOf(vals.take(2500))))
    assert(math.abs(KllAgg.quantile(a, 0.25) - KllAgg.quantile(b, 0.25)) < 150)
    assert(KllAgg.count(a) == KllAgg.count(b))
  }

  private def sketchOf(vs: Seq[Double]): Array[Byte] = {
    val s = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(KllAgg.K)
    vs.foreach(s.update)
    s.toByteArray
  }
}
