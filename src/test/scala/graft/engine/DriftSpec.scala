package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {

  private val base = IndexedSeq(
    Array(0.6, 0.1, 0.1, 0.1, 0.05, 0.05),
    Array(0.62, 0.11, 0.09, 0.08, 0.05, 0.05),
    Array(0.61, 0.1, 0.1, 0.09, 0.06, 0.04),
    Array(0.63, 0.09, 0.11, 0.07, 0.05, 0.05))

  test("z-score: in-family vector passes, shifted vector drifts") {
    val s = Drift.ZScoreScorer(threshold = 3.0)
    val ok = s.score(Array(0.615, 0.1, 0.1, 0.085, 0.05, 0.05), base)
    assert(ok.isInstanceOf[Drift.DriftScored] && !ok.asInstanceOf[Drift.DriftScored].drifted)
    val bad = s.score(Array(0.3, 0.1, 0.1, 0.1, 0.35, 0.05), base)
    assert(bad.asInstanceOf[Drift.DriftScored].drifted)
  }

  test("z-score: skipped when baseline too small") {
    assert(Drift.ZScoreScorer().score(Array(1.0), IndexedSeq(Array(1.0))) == Drift.DriftSkipped)
  }

  test("KS: sup of cumulative diff, drift above threshold") {
    val s = Drift.KsScorer(threshold = 0.25)
    val ok = s.score(Array(0.61, 0.1, 0.1, 0.09, 0.05, 0.05), base)
    assert(!ok.asInstanceOf[Drift.DriftScored].drifted)
    val bad = s.score(Array(0.2, 0.1, 0.1, 0.1, 0.45, 0.05), base)
    assert(bad.asInstanceOf[Drift.DriftScored].drifted)
    // exact: current (1,0,...) vs mean ~(0.615,...) → sup at first cum = 1-0.615
    val exact = s.score(Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0), base)
      .asInstanceOf[Drift.DriftScored]
    val meanFirst = base.map(_(0)).sum / base.length
    assert(math.abs(exact.score - (1.0 - meanFirst)) < 1e-12)
  }

  test("LOF scorer: shifted lang profile drifts, in-family passes") {
    val lof = Drift.LofScorer()
    assert(lof.score(Array(0.1, 0.1, 0.1, 0.1, 0.55, 0.05), base)
      .asInstanceOf[Drift.DriftScored].drifted)
    // expected LOF 0.988083963588647 (numeric trace of the quirky algorithm)
    val near = lof.score(Array(0.615, 0.105, 0.095, 0.085, 0.05, 0.05), base)
      .asInstanceOf[Drift.DriftScored]
    assert(!near.drifted)
    assert(math.abs(near.score - 0.988083963588647) < 1e-9)
  }

  test("smoothed z-score peaks: flat series with one spike") {
    val series = IndexedSeq.tabulate(30)(i => if (i == 20) 100.0 else 10.0 + (i % 3))
    val sig = Drift.smoothedZScorePeaks(series, lag = 5, threshold = 3.5)
    assert(sig(20) == 1, s"expected peak at 20, got $sig")
    assert(sig.take(5).forall(_ == 0)) // warm-up
    assert(sig.zipWithIndex.count { case (v, i) => v != 0 && i != 20 } == 0)
  }

  test("smoothed z-score peaks: trough flagged as -1") {
    val series = IndexedSeq.tabulate(30)(i => if (i == 15) -50.0 else 10.0 + (i % 2))
    val sig = Drift.smoothedZScorePeaks(series, lag = 5, threshold = 3.5)
    assert(sig(15) == -1)
  }

  test("peaks: series shorter than lag → all zeros") {
    assert(Drift.smoothedZScorePeaks(IndexedSeq(1.0, 2.0), lag = 5) == IndexedSeq(0, 0))
  }
}
