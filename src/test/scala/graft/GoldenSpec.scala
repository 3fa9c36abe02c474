package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Golden-file gate for the queries DuckDB cannot express (wrapping 64-bit
  * hash arithmetic, LOF, smoothed z-score peaks): their spec-verified
  * sf0.001 outputs are committed as CSV fixtures and asserted byte-equal —
  * the same silent-regression net the oracle provides for the other 33.
  *
  * Byte-equality is sound at sf0.001 ONLY: every partition holds < 200 rows
  * (the KLL sketch's k), so sketches never hit randomized compaction and
  * q_drift_lof's quantile-derived scores are exact and reproducible. At
  * sf0.01+ the sketches compact and scores wobble in the last ulps — do not
  * re-pin the goldens at a larger SF.
  *
  * Regenerate after an INTENTIONAL semantic change with:
  *   GOLDEN_REGEN=1 sbt -batch "testOnly graft.GoldenSpec"
  * and commit the diff alongside the change that explains it.
  */
class GoldenSpec extends SparkSpec {

  private val Names = Seq("q_drift_lof", "q_peaks", "d_minhash_pairs",
    "d_simhash_pairs", "e_ann_lsh", "e_ann_ivf")

  private val sfDir = "/root/testdata/sf0.001"
  private val goldenDir = "src/test/resources/golden"

  private def fmt(v: Any): String = v match {
    case null => "∅"
    case x => x.toString // Double.toString is exact & stable on the JVM
  }

  /** Header + rows in the query's own (orderBy-pinned) order. */
  private def render(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.columns.mkString("|") +:
      df.collect().map(_.toSeq.map(fmt).mkString("|")).toSeq
  }

  Names.foreach { name =>
    test(s"golden: $name matches the committed sf0.001 fixture") {
      val got = render(name)
      val path = Paths.get(goldenDir, s"$name.csv")
      if (sys.env.contains("GOLDEN_REGEN")) {
        Files.createDirectories(path.getParent)
        Files.write(path, got.asJava)
        info(s"regenerated $path (${got.size - 1} rows)")
      } else {
        assert(Files.exists(path),
          s"missing golden fixture $path — run GOLDEN_REGEN=1 testOnly graft.GoldenSpec")
        val want = Files.readAllLines(path).asScala.toSeq
        assert(got.size == want.size,
          s"$name row count diverged: golden ${want.size - 1}, got ${got.size - 1}")
        got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
          assert(g == w, s"$name line $i diverged from golden:\n  golden: $w\n  got:    $g")
        }
      }
    }
  }
}
