package graft.engine

/** Distribution-drift scorers over per-partition profile vectors
  * (SURVEY §2.9 U1: the reference's pluggable Predictor trait re-expressed as
  * plain strategy objects; reference internal/predictor/predictor.go:20-26).
  *
  * A profile vector is a small fixed-order summary of one partition
  * (FIXTURES.md §4): lang probabilities (6-D) or log-scaled text-length
  * quantiles (5-D). Scorers compare the current partition's vector against the
  * baseline snapshot's vectors — the immutable "green" model of ST7.
  */
object Drift {

  sealed trait DriftVerdict {
    def status: String
  }
  case object DriftSkipped extends DriftVerdict { val status = "skipped" }
  final case class DriftScored(score: Double, drifted: Boolean) extends DriftVerdict {
    val status = "scored"
  }

  trait Scorer {
    def name: String
    def score(current: Array[Double], baseline: IndexedSeq[Array[Double]]): DriftVerdict
  }

  /** LOF neighbor-density drift — reference-exact semantics via [[Lof.Model]].
    * k=3 / Euclidean / outlier ⇔ score > 1 mirror the reference defaults
    * (lof/config.go:34-36, lof.go:15).
    */
  final case class LofScorer(k: Int = Lof.MinKNum, skipItems: Int = 0) extends Scorer {
    val name = "drift_lof"
    def score(current: Array[Double], baseline: IndexedSeq[Array[Double]]): DriftVerdict =
      Lof.Model(baseline, k, skipItems).predict(current) match {
        case Lof.Skipped       => DriftSkipped
        case Lof.Scored(s, o)  => DriftScored(s, o)
      }
  }

  /** Per-dimension z-score vs the baseline population; drift when any |z|
    * exceeds the threshold. Deterministic two-pass mean/std (sample std, n-1).
    *
    * `minStd` floors the denominator: with few baseline partitions the sample
    * std of a stable dimension underestimates real sampling noise, turning
    * harmless per-partition jitter into huge z values. 0.01 is calibrated to
    * the engine's profile vectors (probabilities / log-quantiles), where real
    * drift moves dimensions by ≥ 0.1.
    */
  final case class ZScoreScorer(threshold: Double = 3.0, minStd: Double = 0.01)
      extends Scorer {
    val name = "drift_zscore"
    def score(current: Array[Double], baseline: IndexedSeq[Array[Double]]): DriftVerdict = {
      if (baseline.length < 2) return DriftSkipped
      val d = current.length
      if (baseline.exists(_.length != d)) return DriftSkipped
      var worst = 0.0
      var j = 0
      while (j < d) {
        val xs = baseline.map(_(j))
        val n = xs.length
        val mean = xs.sum / n
        val variance = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
        val sd = math.max(math.sqrt(variance), minStd)
        val z = math.abs((current(j) - mean) / sd)
        if (z > worst) worst = z
        j += 1
      }
      DriftScored(worst, worst > threshold)
    }
  }

  /** Kolmogorov–Smirnov-style sup-distance between the current profile vector
    * and the element-wise mean of the baseline vectors, treating the vectors
    * as discrete CDown/PMF summaries. For probability-vector profiles this is
    * the total-variation-flavored sup over cumulative sums.
    */
  final case class KsScorer(threshold: Double = 0.25) extends Scorer {
    val name = "drift_ks"
    def score(current: Array[Double], baseline: IndexedSeq[Array[Double]]): DriftVerdict = {
      if (baseline.isEmpty) return DriftSkipped
      val d = current.length
      if (baseline.exists(_.length != d)) return DriftSkipped
      val mean = Array.tabulate(d)(j => baseline.map(_(j)).sum / baseline.length)
      var cdfA = 0.0; var cdfB = 0.0; var sup = 0.0
      var j = 0
      while (j < d) {
        cdfA += current(j); cdfB += mean(j)
        val diff = math.abs(cdfA - cdfB)
        if (diff > sup) sup = diff
        j += 1
      }
      DriftScored(sup, sup > threshold)
    }
  }

  /** Smoothed z-score windowed peak detection over a 1-D series (the
    * "z-score/windowed peak detection" half of the north_star). Classic
    * lag/threshold/influence algorithm, fully deterministic.
    *
    * Returns one flag per element: +1 peak, -1 trough, 0 normal; the first
    * `lag` elements are always 0 (warm-up — mirrors the reference's skipItems
    * guard semantics, manager.go:374-379).
    */
  def smoothedZScorePeaks(
      series: IndexedSeq[Double],
      lag: Int = 5,
      threshold: Double = 3.5,
      influence: Double = 0.5
  ): IndexedSeq[Int] = {
    val n = series.length
    if (n < lag + 1) return IndexedSeq.fill(n)(0)
    val signals = Array.fill(n)(0)
    val filtered = series.toArray.clone()
    def meanStd(xs: Array[Double], from: Int, until: Int): (Double, Double) = {
      val len = until - from
      var s = 0.0; var i = from
      while (i < until) { s += xs(i); i += 1 }
      val m = s / len
      var v = 0.0; i = from
      while (i < until) { v += (xs(i) - m) * (xs(i) - m); i += 1 }
      (m, math.sqrt(v / len))
    }
    var (avg, std) = meanStd(filtered, 0, lag)
    var i = lag
    while (i < n) {
      val x = series(i)
      if (std > 0 && math.abs(x - avg) > threshold * std) {
        signals(i) = if (x > avg) 1 else -1
        filtered(i) = influence * x + (1 - influence) * filtered(i - 1)
      } else {
        signals(i) = 0
        filtered(i) = x
      }
      val ms = meanStd(filtered, i - lag + 1, i + 1)
      avg = ms._1; std = ms._2
      i += 1
    }
    signals.toIndexedSeq
  }
}
