package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round instrumentation (guide §1): per-query noop-sink
  * timing (times the computation, not the sink — §1.4) and formatted-plan
  * dumps for the before/after evidence in plans/r06/. SEPARATE main from
  * [[Bench]], which is frozen as the driver's measurement harness.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra plans <outDir> <suffix> [q1,q2,...]"
  *   sbt "runMain graft.BenchExtra time  [q1,q2,...]"   (noop sink, §1.4)
  *   sbt "runMain graft.BenchExtra count [q1,q2,...]"   (frozen-Bench action)
  *
  * Env contract matches Bench: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object BenchExtra {

  /** The bench picks plus the headline, in Bench order. */
  val BenchPicks: Seq[String] = Seq("q_stats", "q_unique_url", "q_ref_orphans",
    "q_retention_count", "d_minhash_pairs", "d_dedup_exact", "e_ann_brute",
    "m_media_bytes", "d_quality", "q_quantiles", "e_dedup_cos", "q_drift_ks",
    "d_simhash_pairs", "d_gopher", "d_c4_filter", "d_host_cap", "d_para_dedup",
    "d_strip_lines", "d_curate")

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

    val mode = if (args.nonEmpty) args(0) else "time"
    try {
      mode match {
        case "plans" if args.length < 3 =>
          System.err.println(
            "usage: BenchExtra plans <outDir> <suffix> [q1,q2,...]")
          sys.exit(64)
        case "plans" =>
          val outDir = args(1)
          val suffix = args(2)
          val subset =
            if (args.length > 3) args(3).split(",").toSeq else BenchPicks
          new java.io.File(outDir).mkdirs()
          subset.foreach { name =>
            val df = SparkEntry.queries(name)(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
            java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
            println(s"wrote $p (${txt.length} chars)")
            spark.catalog.clearCache()
          }
        case "time" | "count" =>
          val subset =
            if (args.length > 1) args(1).split(",").toSeq else BenchPicks
          val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
          // "count" replicates the frozen Bench action exactly (unreferenced
          // projections prune); "time" is the §1.4 noop sink (computes every
          // column) — use count for bench-comparable numbers, noop for
          // full-computation isolation.
          def noop(df: DataFrame): Unit =
            if (mode == "count") { df.count(); () }
            else df.write.format("noop").mode("overwrite").save()
          // warm up each plan once (codegen + page cache), then min of reps
          val rows = subset.map { name =>
            val fn = SparkEntry.queries(name)
            spark.sparkContext.setJobDescription(s"warmup:$name")
            noop(fn(spark, sfDir)); spark.catalog.clearCache()
            val ts = (1 to reps).map { i =>
              spark.sparkContext.setJobDescription(s"$name:rep$i")
              val t0 = System.nanoTime()
              noop(fn(spark, sfDir))
              val t = (System.nanoTime() - t0) / 1e9
              spark.catalog.clearCache()
              t
            }
            f""""$name":{"min":${ts.min}%.3f,"reps":[${ts.map(t => f"$t%.3f").mkString(",")}]}"""
          }
          println(rows.mkString("{", ",", "}"))
        case other =>
          System.err.println(s"unknown mode '$other' — expected plans|time|count")
          sys.exit(64)
      }
    } finally spark.stop()
  }
}
