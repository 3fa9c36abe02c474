package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine._

/** Temporary instrumentation for scaling analysis. */
object DebugScale {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // fixture dir = ScaleBench's current layout (arg 2 overrides)
    val fixture =
      if (args.length > 1) args(1) else "target/fixtures/bench_wp_v2_8000000"
    val wp = spark.read.parquet(fixture)
    // warmups
    Validator.validate(wp.limit(10000), Validator.Config(Validator.DefaultChecks)) match {
      case r => r.violations.count(); r.verdicts.count()
    }
    time("scan_only_count")(wp.where(length(col("text")) > 100000).count())
    time("fused_stats")(StatsPass.statsAndProfiles(wp).collect())
    time("row_checks")(Constraints.runRowChecks(wp,
      Seq(Constraints.NotNull("url"), Constraints.NotNull("text"),
        Constraints.NotNull("lang"), Constraints.ByteIdenticalText)).count())
    time("unique")(Constraints.Unique("url").violations(wp).count())
    // unpersist between passes: without it the 2nd pass silently reads the
    // 1st pass's cache (CacheManager dedupes canonically-equal plans) and
    // times only the cached-read cost
    time("full_validate") {
      val res = Validator.validate(wp, Validator.Config(Validator.DefaultChecks))
      res.violations.count(); res.verdicts.count()
      res.unpersist()
    }
    time("full_validate_2nd") {
      val res = Validator.validate(wp, Validator.Config(Validator.DefaultChecks))
      res.violations.count(); res.verdicts.count()
      res.unpersist()
    }
    spark.stop()
  }
}
