package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Validator
import graft.fixtures.WebGen

/** Two-cluster-size scaling evidence (north_rule: efficiency ≥ 0.8 from N to
  * 4N executors). No real cluster exists in this sandbox, so the criterion is
  * evidenced exactly as BASELINE.md specifies: the SAME validation job on the
  * SAME input at local[N] and local[4N] (shuffle partitions scaled with
  * cores), reporting docs/sec at both plus efficiency = (T_N / T_4N) / 4.
  *
  * Input: the 2M-row deterministic WebGen bench fixture (FIXTURES.md §1),
  * written once to target/fixtures/bench_wp and reused.
  */
object ScaleBench {

  /** ONE exact-match mode read shared by fixture selection and the pass
    * dispatch — a substring match in one place and equality in another
    * would let a sloppy env value (e.g. "cluster-mode") build the text
    * fixture and then run the WRONG pass over it.
    */
  private def scaleMode: String =
    sys.env.getOrElse("SPARK_GRAFT_SCALE_MODE", "validate").trim

  private val Rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "8000000").toLong
  private val FixtureDir = s"target/fixtures/bench_wp_v2_$Rows"

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scalebench-$cores")
      // Shuffle partitions scale with the cluster (like a real deploy would
      // size them per executor count); override for one-off experiments via
      // SPARK_GRAFT_SHUFFLE_PARTS.
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS").map(_.toInt)
          .getOrElse(math.max(cores, 8)))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Scan-task granularity must scale with the cluster: the default
      // 128 MiB packing collapsed the 64-file fixture into ~8 scan tasks,
      // capping parallelism at 8 regardless of cores (observed: identical
      // wall time at local[8] and local[32]). 16 MiB ≈ one task per file
      // here; on a real cluster this is the same knob you'd tune per
      // executor count (or let AQE+splittable formats handle).
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      // sketch aggregates (KLL/HLL via ObjectHashAggregate) must stay
      // hash-based with thousands of partition groups; the default fallback
      // threshold (128 keys) degrades them to a full per-task sort
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def warmDir = s"$FixtureDir.warm"

  /** Realistic-vocabulary text fixture for the dedup scale mode. The WebGen
    * page fixture draws from a 20-word bank — 8,000 possible 3-gram shingles
    * across 8M docs turns EVERY LSH band bucket hot, a worst case real web
    * text (vocab ≥ 10^5) does not exhibit. Here: 40 pseudo-words per doc from
    * a 100k base-36 vocabulary, fully deterministic; every 10th doc is a
    * near-dup of its predecessor with one word changed (3-gram Jaccard ≈ 0.85,
    * above the 0.8 verify threshold), so the pass finds real pairs.
    */
  private def dedupFixtureDir = s"target/fixtures/bench_text_v1_$Rows"

  private def ensureDedupFixture(): Unit = {
    val needMain = !Files.exists(Paths.get(dedupFixtureDir))
    val needWarm = !Files.exists(Paths.get(dedupFixtureDir + ".warm"))
    if (!needMain && !needWarm) return
    val s = session(32)
    def corpus(n: Long, slices: Int) = {
      val id = col("id")
      val seed = when(id % 10 === 0 && id > 0, id - 1).otherwise(id)
      val words = transform(
        sequence(lit(0), lit(39)),
        j => conv(pmod(xxhash64(seed, j), lit(100000)).cast("string"), 10, 36))
      // the near-dup's last word differs (derived from the row's own id)
      val text = concat_ws(" ",
        concat(
          slice(words, 1, 39),
          array(conv(pmod(xxhash64(id, lit(40)), lit(100000)).cast("string"), 10, 36))))
      s.range(0L, n, 1L, slices)
        .select(concat(lit("doc:"), id.cast("string")).as("url"), text.as("text"))
    }
    if (needMain)
      corpus(Rows, 64).write.mode("overwrite").parquet(dedupFixtureDir)
    if (needWarm)
      corpus(50000, 8).write.mode("overwrite").parquet(dedupFixtureDir + ".warm")
    s.stop()
  }

  private def ensureFixture(): Unit = {
    val needMain = !Files.exists(Paths.get(FixtureDir))
    val needWarm = !Files.exists(Paths.get(warmDir))
    if (needMain || needWarm) {
      val s = session(32)
      if (needMain) {
        // 64 id-contiguous slices → each file covers a contiguous day range,
        // like a real time-partitioned crawl table (Iceberg days(warc_ts)):
        // map-side partial aggregation sees ~P/64 groups per task instead of
        // all P (round-robin repartition had inflated agg partials 64×)
        WebGen.generate(s, Rows,
          flags = WebGen.Flags(nullText = true, badExtract = true, dupUrls = true),
          slices = 64)
          .withColumnRenamed("p_day", "partition")
          .write.mode("overwrite").parquet(FixtureDir)
      }
      // small same-schema warm-up input: warming with an IDENTICALLY-shaped
      // plan (plain parquet read, no limit) hits the codegen cache for the
      // timed run — a `limit(n)` warm-up compiles different generated classes
      // and leaves Janino+JIT cost inside the timed window
      if (needWarm) {
        WebGen.generate(s, 50000, flags = WebGen.Flags(nullText = true, badExtract = true, dupUrls = true))
          .withColumnRenamed("p_day", "partition")
          .repartition(8)
          .write.mode("overwrite").parquet(warmDir)
      }
      s.stop()
    }
  }

  /** One full validation pass over the given input; counts outputs. */
  private def pass(s: SparkSession, dir: String): Unit = {
    if (scaleMode == "cluster") {
      // full dedup RESOLUTION path at row scale: MinHash+LSH pairs over the
      // realistic-vocabulary fixture, then connected components + canonical
      // survivor count — the end-to-end "drop the near-dups from the
      // corpus" job a training pipeline runs (pairs alone are not a
      // dedup; the components are).
      val docs = s.read.parquet(dir)
      import org.apache.spark.sql.functions.col
      val pairs = graft.operators.Dedup
        .minhashLshPairs(docs, col("url"), col("text"), threshold = 0.8)
      // no caller-side checkpoint needed: dupClusters evaluates the pair
      // plan once (explode symmetrization) and iterates on its own
      // checkpointed ids-only graph
      graft.operators.Dedup
        .dropNearDupLosers(docs, pairs, col("url"), col("id_a"), col("id_b"))
        .count()
      ()
    } else if (scaleMode == "dedup") {
      // MinHash+LSH near-dup pass over realistic-vocabulary text: signature
      // UDF (64 hashes), banded candidate shuffle (ids only), capped buckets,
      // exact-Jaccard verify — the LLM-pipeline dedup path at row scale.
      // (`dir` here is the dedup text fixture, swapped in by run().)
      val docs = s.read.parquet(dir)
      import org.apache.spark.sql.functions.col
      graft.operators.Dedup
        .minhashLshPairs(docs, col("url"), col("text"), threshold = 0.8)
        .count()
      ()
    } else if (scaleMode == "spandedup") {
      // paragraph/span dedup at row scale with the pathological key ON:
      // every doc carries one copy of the same banner paragraph (Rows
      // copies of ONE window key) — survivable only because the rank
      // filter runs as a partial WindowGroupLimit before the exchange.
      // sum(length) forces the rebuilt text to materialize (a bare count
      // would let Catalyst prune the rebuild's concat work away).
      import org.apache.spark.sql.functions.{col, concat, length, lit, sum}
      val docs = s.read.parquet(dir).select(col("url"),
        concat(col("text"),
          lit("\n\nShared cookie banner paragraph accepted by every site."))
          .as("text"))
      graft.operators.Dedup.dedupParagraphs(docs, "url", "text")
        .agg(sum(length(col("text")))).collect()
      ()
    } else if (scaleMode == "scan") {
      // perfectly-parallel control: single stage, no shuffle, no driver work
      // (regex-extract + compare over every row) — measures the machine's
      // scaling ceiling for the engine's string-heavy workload class
      val wp = s.read.parquet(dir)
      wp.where(org.apache.spark.sql.functions.col("text").isNotNull &&
          org.apache.spark.sql.functions.col("text") =!=
            graft.engine.TextExtract.extractTextCol(org.apache.spark.sql.functions.col("html")))
        .count()
      ()
    } else {
      val wp = s.read.parquet(dir)
      val res = Validator.validate(wp, Validator.Config(Validator.DefaultChecks))
      res.violations.count()
      res.verdicts.count()
      res.unpersist()
    }
  }

  /** Timed pass over the fixture; returns wall seconds. */
  private def run(cores: Int): Double = {
    // cluster mode resolves the same text fixture's pair graph
    val dedup = scaleMode == "dedup" || scaleMode == "cluster" || scaleMode == "spandedup"
    val (warm, main) =
      if (dedup) (dedupFixtureDir + ".warm", dedupFixtureDir)
      else (warmDir, FixtureDir)
    val s = session(cores)
    try {
      pass(s, warm) // identical plan shape → codegen + JIT warm (untimed)
      val t0 = System.nanoTime()
      pass(s, main)
      (System.nanoTime() - t0) / 1e9
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    if (scaleMode == "dedup" || scaleMode == "cluster" || scaleMode == "spandedup") ensureDedupFixture()
    else ensureFixture()
    // Single-measurement mode: `runMain graft.ScaleBench <cores> [reps]`
    // prints one JSON line. Meant to run under an OS-level core budget
    // (`taskset -c 0..N-1`) so the "cluster size" includes the JVM's GC/JIT
    // threads — exactly what an N-core executor gets. In-JVM local[N] alone
    // under-counts the cores the JVM really consumes.
    if (args.nonEmpty) {
      val c = args(0).toInt
      val reps = if (args.length > 1) args(1).toInt else 2
      val t = (1 to reps).map(_ => run(c)).min
      println(f"""{"metric":"scale_single","cores":$c%d,"t_sec":$t%.2f,"docs":$Rows%d,"docs_per_sec":${Rows / t}%.1f}""")
      return
    }
    // Default N=2 (→ 4N=8): a pure-CPU control on this VM shows 8→32 workers
    // yields only 2.86× even for embarrassingly-parallel arithmetic (cpu
    // frequency/steal ceiling ≈ 0.72 efficiency), while 1→8 scales at 7.6×.
    // 2→8 measures the ENGINE's scaling, not the hypervisor's. See
    // BENCH_SCALING.md for both measurements.
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val n4 = n * 4
    // interleaved reps, min per config: robust to ambient machine noise
    val times = (1 to reps).flatMap(_ => Seq(n -> run(n), n4 -> run(n4)))
    val tN = times.collect { case (c, t) if c == n => t }.min
    val t4N = times.collect { case (c, t) if c == n4 => t }.min
    val docs = Rows
    val thrN = docs / tN
    val thr4N = docs / t4N
    val eff = (tN / t4N) / 4.0
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","cores_n":$n%d,"cores_4n":$n4%d,"t_n_sec":$tN%.2f,"t_4n_sec":$t4N%.2f,"docs":$docs%d,"docs_per_sec_n":$thrN%.1f,"docs_per_sec_4n":$thr4N%.1f}""")
  }
}
