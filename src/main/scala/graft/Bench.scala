package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Validator

/** Per-round benchmark: timed headline queries at SPARK_GRAFT_SF_DIR.
  *
  * Prints ONE JSON line: {"metric","value","unit","queries","sf"} plus
  * validated-docs throughput extras. The headline is the full validation
  * suite (stats + constraints + uniqueness + referential + drift) — the
  * north-rule metric is validated docs/sec.
  *
  * The artifact is SELF-EVIDENCING: alongside the min-of-reps per query it
  * records every rep's wall time (`rep_times`) and a machine-noise sentinel —
  * the perfectly-parallel single-stage scan control from ScaleBench, run
  * before and after the timed section. This VM has documented degraded
  * windows (all workloads 20–50% slower for tens of minutes, invisible from
  * inside — BENCH_SCALING.md); round 3's official artifact recorded a 3×
  * outlier with nothing in the file to flag it. Now a reader compares
  * `noise_sentinel_sec` against its ledgered healthy value (~0.3 s at sf0.1)
  * and the rep spread before calling anything a regression.
  */
object Bench {

  /** The flagship pass: everything the engine does in one run, over a
    * MATERIALIZED web-pages table — the production shape per `input_hint`
    * (the engine validates an Iceberg/parquet table; deriving the fixture
    * from TPC-H is harness setup, not engine work, and is done once untimed
    * in [[main]]). Each rep honestly recomputes: r2's headline was silently
    * reading the previous rep's leaked violations cache (the CacheManager
    * dedupes canonically-equal plans, and fullSuite never unpersisted
    * violations) — fixed by Result.unpersist, which made the artifact
    * visible as a phantom "regression".
    */
  def fullSuite(spark: SparkSession, tableDir: String): Long = {
    val frame = spark.read.parquet(tableDir)
    val res = Validator.validate(frame, Validator.Config(Validator.DefaultChecks))
    // materialize everything the pass produces
    val v = res.violations.count()
    val s = res.verdicts.count()
    res.unpersist()
    v + s
  }

  /** Machine-noise sentinel: single stage, no shuffle, no driver work —
    * regex-extract + compare over every row of the materialized table. Any
    * engine change leaves this untouched, so a drift in ITS time between
    * runs is hypervisor weather, not a regression.
    */
  private def noiseSentinel(spark: SparkSession, tableDir: String): Double = {
    val t0 = System.nanoTime()
    spark.read.parquet(tableDir)
      .where(col("text").isNotNull &&
        col("text") =!= graft.engine.TextExtract.extractTextCol(col("html")))
      .count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Harness setup (untimed): materialize the derived web-pages frame to a
    // parquet table once — the pass under test validates a TABLE, exactly
    // the input_hint contract and the same shape ScaleBench uses. The path
    // is discriminated by SF dir and process: a concurrent run at another
    // SF (or a parallel invocation) must not overwrite the table this
    // JVM's timed reps are mid-scan on.
    val wpDir = s"${System.getProperty("java.io.tmpdir")}/graft_bench_wp_" +
      s"${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}_${ProcessHandle.current().pid()}"
    // cleanup must survive ANY failure: a crashed rep would otherwise leak a
    // full parquet copy of the table per invocation (PID-unique name = no
    // later run ever reuses or reclaims it)
    try {
      val nDocs = spark.read.parquet(s"$sfDir/orders.parquet").count()
      Derive.webPages(spark, sfDir).withColumnRenamed("part", "partition")
        .write.mode("overwrite").parquet(wpDir)

      // Warm-up: one UNTIMED full pass over the ACTUAL benchmark input. This
      // warms the OS page cache for the real files AND compiles/JITs the real
      // sf-sized plans — a tiny-SF warmup warms neither, and round 1's headline
      // was ~15× plan cost because first-touch I/O + codegen landed inside the
      // timed window.
      fullSuite(spark, wpDir)

      // warm the sentinel's own plan once (it is a different plan shape
      // than the suite, so its first run pays codegen — r4's first artifact
      // showed before=0.61 vs after=0.34 purely from that compile)
      noiseSentinel(spark, wpDir)
      val sentinelBefore = noiseSentinel(spark, wpDir)

      // Min of N reps per query (the minimum is the plan cost; ambient noise
      // only ever adds time) — but EVERY rep is recorded in the artifact so a
      // reader can see the spread a degraded window produces. The UNTIMED
      // cache clear between reps keeps every rep an honest recompute:
      // operators that persist internally (Curate's multi-eval guard) would
      // otherwise feed rep 2+ through the CacheManager's plan-dedup — the
      // exact r2 artifact where the headline silently read the previous
      // rep's cache.
      val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
      def time(f: => Unit): Seq[Double] =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          f
          val t = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          t
        }

      val headlineReps = time(fullSuite(spark, wpDir))

      val picks = Seq("q_stats", "q_unique_url", "q_ref_orphans", "q_retention_count",
        "d_minhash_pairs", "d_dedup_exact", "e_ann_brute", "m_media_bytes",
        "d_quality", "q_quantiles", "e_dedup_cos", "q_drift_ks", "d_simhash_pairs",
        // r5 webtext-pipeline picks: two row-local rule families, the
        // WindowGroupLimit host cap, the two cross-doc rebuild ops, and
        // the full curation chain composed
        "d_gopher", "d_c4_filter", "d_host_cap", "d_para_dedup", "d_strip_lines",
        "d_curate")
      val results: Seq[(String, Seq[Double])] =
        ("full_suite" -> headlineReps) +: picks.map { name =>
          val fn = SparkEntry.queries(name)
          name -> time { fn(spark, sfDir).count(); () }
        }

      val sentinelAfter = noiseSentinel(spark, wpDir)

      val headline = headlineReps.min
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f"${v.min}%.3f" }
        .mkString("{", ",", "}")
      val repJson = results.map { case (k, v) =>
        "\"" + k + "\":" + v.map(t => f"$t%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val total = results.map(_._2.min).sum
      val docsPerSec = nDocs / headline
      println(
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"rep_times":$repJson%s,"reps_per_query":$reps%d,"noise_sentinel_sec":[$sentinelBefore%.3f,$sentinelAfter%.3f],"sf":"$sfDir%s","validated_docs":$nDocs%d,"docs_per_sec":$docsPerSec%.1f}""")
    } finally {
      val wpPath = new org.apache.hadoop.fs.Path(wpDir)
      wpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(wpPath, true)
      spark.stop()
    }
  }
}
