package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what roll-up compaction buys the per-tick reconciliation read
  * (the hot consumer of the streaming output tree): seed ONE lineage with
  * `SPARK_GRAFT_COMPACT_DIRS` (default 512) per-micro-batch dirs of
  * `SPARK_GRAFT_COMPACT_ROWS_PER` (default 200) rows each — the shape a
  * minutes-cadence stream leaves behind — then time the
  * [[StreamingValidate.withSeenPriorFlag]]-shaped scan (url projection +
  * distinct + count) before compaction, run [[StreamCompact]], and time the
  * same scan after. The before/after delta is pure small-file/listing
  * overhead: the row count is identical.
  *
  * Run: `sbt -batch "runMain graft.streaming.StreamCompactBench"` — one
  * JSON line. Numbers feed BENCH_SCALING.md's ledger; local-FS listing is
  * CHEAP relative to object stores, so the measured ratio is a LOWER bound
  * on the win where it matters.
  */
object StreamCompactBench {

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_COMPACT_DIRS", "512").toInt
    val rowsPer = sys.env.getOrElse("SPARK_GRAFT_COMPACT_ROWS_PER", "200").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_COMPACT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("stream-compact-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("compact_bench").toString
    val pages = s"$out/pages"
    // seed: one dir per "micro-batch", written exactly where the sink's
    // dynamic partition overwrite would put it
    (0 until dirs).foreach { b =>
      spark.range(b.toLong * rowsPer, (b + 1).toLong * rowsPer, 1, 1)
        .select(
          concat(lit("https://e.org/"), col("id")).as("url"),
          to_timestamp(lit("2025-07-01 00:00:00")).as("warc_ts"),
          lit(Array[Byte](120)).as("html"),
          concat(lit("text "), col("id")).as("text"),
          lit("en").as("lang"),
          lit("2025-07-01").as("partition"))
        .write.mode("overwrite").parquet(s"$pages/lineage=q/ingest_batch=$b")
    }

    // the reconciliation-shaped read: url projection, distinct, count —
    // fresh listing per rep (Spark caches FileIndex per DataFrame, not
    // across spark.read calls)
    def tick(): Double = {
      val t0 = System.nanoTime()
      spark.read.option("ignoreMissingFiles", "true").parquet(pages)
        .where(!(col("lineage") === "live" && col("ingest_batch") === 999999L))
        .select(col("url")).distinct().count()
      (System.nanoTime() - t0) / 1e9
    }

    tick() // codegen/JIT warm (untimed shape warm-up)
    val before = (1 to reps).map(_ => tick()).min

    val tc0 = System.nanoTime()
    val res = StreamCompact.compactTable(spark, pages, "pages",
      keepBatches = 2, targetFileBytes = 128L * 1024 * 1024)
    val compactSec = (System.nanoTime() - tc0) / 1e9

    val after = (1 to reps).map(_ => tick()).min
    val filesAfter = {
      val fs = new org.apache.hadoop.fs.Path(pages)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(pages), true)
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      n
    }
    println(f"""{"metric":"compact_tick_speedup","dirs_before":$dirs%d,"rows":${dirs.toLong * rowsPer}%d,"tick_before_sec":$before%.3f,"tick_after_sec":$after%.3f,"speedup":${before / after}%.2f,"compact_sec":$compactSec%.2f,"absorbed_dirs":${res.absorbedDirs}%d,"absorbed_files":${res.absorbedFiles}%d,"files_after":$filesAfter%d}""")
    spark.stop()
  }
}
