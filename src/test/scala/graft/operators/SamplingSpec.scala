package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling: reproducibility, fraction accuracy, stratum
  * bounds, salt independence, and the zero-shuffle plan contract.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = spark.range(0L, 10000L)
    .select(col("id").as("doc_id"),
      concat(lit("lang"), (col("id") % 7).cast("string")).as("lang"))

  test("hashFraction: deterministic, salt-sensitive, fraction-accurate") {
    val a = Sampling.hashFraction(corpus, col("doc_id"), 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashFraction(corpus, col("doc_id"), 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same key+salt must select the same rows")
    // uniform md5 prefix → binomial(10000, 0.25): ±4σ ≈ ±173
    assert(math.abs(a.size - 2500) < 180, s"fraction off: ${a.size}/10000")
    val c = Sampling.hashFraction(corpus, col("doc_id"), 0.25, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(c != a, "a different salt must draw a different subset")
    assert(Sampling.hashFraction(corpus, col("doc_id"), 0.0).isEmpty)
    assert(Sampling.hashFraction(corpus, col("doc_id"), 1.0).count() == 10000L)
  }

  test("hashFraction is a pure filter: no exchange in the plan") {
    val plan = Sampling.hashFraction(corpus, col("doc_id"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sampling must not shuffle:\n$plan")
  }

  test("stratifiedExact: exactly min(n, |stratum|) per stratum, deterministic") {
    val s1 = Sampling.stratifiedExact(corpus, col("lang"), col("doc_id"), 5, "s2")
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.size == 7 && byLang.values.forall(_ == 5L), byLang.toString)
    val again = Sampling.stratifiedExact(corpus, col("lang"), col("doc_id"), 5, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(again == s1.select("doc_id").as[Long].collect().toSet)
    // a stratum smaller than n yields the whole stratum
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "lang")
    val t = Sampling.stratifiedExact(tiny, col("lang"), col("doc_id"), 5)
    assert(t.count() == 3L)
  }

  test("null keys are sampled as one sentinel key, never silently dropped") {
    val withNulls = Seq((Some("k1"), "x"), (None, "x"), (None, "y"))
      .toDF("key", "lang")
    // fraction 1.0 must be the identity — null keys included
    assert(Sampling.hashFraction(withNulls, col("key"), 1.0).count() == 3L)
    // all-or-none: both null-key rows share one hash verdict at any fraction
    val kept = Sampling.hashFraction(withNulls, col("key"), 0.5, "z")
      .where(col("key").isNull).count()
    assert(kept == 0L || kept == 2L, s"null keys split: $kept")
    // stratifiedExact ranks null keys via the sentinel (no engine-specific
    // null ordering in the window), and never errors on them
    val t = Sampling.stratifiedExact(withNulls, col("lang"), col("key"), 1)
    assert(t.count() == 2L) // one per stratum
  }

  test("thresholdHex edges: 0 keeps nothing, 1 keeps everything, 0.25 is 40000000") {
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "g")
    intercept[IllegalArgumentException](Sampling.thresholdHex(1.5))
  }

  test("byScore: survivor set exactly matches the recomputed hash-vs-threshold rule") {
    val scored = corpus.withColumn("score", (col("doc_id") % 10) / 10.0)
    val kept = Sampling.byScore(scored, col("doc_id"), col("score"), "q")
      .select("doc_id").as[Long].collect().toSet
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = (0L until 10000L).filter { id =>
      val p = (id % 10) / 10.0
      md5hex(s"q$id").take(8) < f"${(p * 4294967296.0).toLong}%08x"
    }.toSet
    assert(kept == want, s"${kept.size} vs ${want.size}")
    // proportionality: the score-0.9 decile keeps ~9x the score-0.1 decile
    val k1 = kept.count(_ % 10 == 1).toDouble
    val k9 = kept.count(_ % 10 == 9).toDouble
    assert(k1 > 50 && k9 > 800 && math.abs(k9 / (k1 + k9) - 0.9) < 0.05,
      s"k1=$k1 k9=$k9")
  }

  test("byScore edges: p>=1 keeps all, p<=0 and null scores drop; pure filter plan") {
    val edge = Seq((1L, Some(1.0)), (2L, Some(7.5)), (3L, Some(0.0)),
      (4L, Some(-2.0)), (5L, Option.empty[Double]),
      (6L, Some(Double.NaN))) // 0/0-derived; Spark orders NaN ABOVE 1.0 —
      .toDF("doc_id", "score") // must drop, not keep-all
    val kept = Sampling.byScore(edge, col("doc_id"), col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), kept.toString)
    val plan = Sampling.byScore(corpus.withColumn("s", lit(0.5)),
        col("doc_id"), col("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"byScore must not shuffle:\n$plan")
  }
}
