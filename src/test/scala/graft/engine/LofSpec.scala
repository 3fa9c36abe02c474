package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's golden numerics and LOF quirks (FIXTURES.md §2-3). */
class LofSpec extends AnyFunSuite {

  // --- distance goldens from /root/reference/internal/geom/distance_test.go
  test("euclidean matches reference golden values exactly") {
    assert(Lof.euclidean(Array(1.2, 2.0), Array(2.0, 3.0)) == 1.2806248474865698)
    assert(Lof.euclidean(Array(10.0, 2.0), Array(5.0, 3.0)) == 5.0990195135927845)
  }

  test("chebyshev matches reference golden values exactly") {
    assert(Lof.chebyshev(Array(1.2, 2.0), Array(2.0, 3.0)) == 1.0)
    assert(Lof.chebyshev(Array(10.0, 2.0), Array(5.0, 3.0)) == 5.0)
  }

  test("manhattan matches reference golden values exactly") {
    assert(Lof.manhattan(Array(1.2, 2.0), Array(2.0, 3.0)) == 1.8)
    assert(Lof.manhattan(Array(10.0, 2.0), Array(5.0, 3.0)) == 6.0)
  }

  test("dimension mismatch raises (distance_test.go:23-24)") {
    intercept[Lof.DimMismatchException](Lof.euclidean(Array(5.0, 2.0), Array(3.0)))
    intercept[Lof.DimMismatchException](Lof.manhattan(Array(5.0, 2.0), Array(3.0)))
    intercept[Lof.DimMismatchException](Lof.chebyshev(Array(5.0, 2.0), Array(3.0)))
  }

  // --- LOF-1: README scenario (reference README.md:62-86)
  test("LOF-1: baseline {[10],[10],[10]}, [100] outlier, [10] normal") {
    val m = Lof.Model(IndexedSeq(Array(10.0), Array(10.0), Array(10.0)))
    m.predict(Array(100.0)) match {
      case Lof.Scored(score, outlier) =>
        assert(outlier, s"expected outlier, score=$score")
        assert(score > Lof.Threshold)
      case other => fail(s"expected Scored, got $other")
    }
    m.predict(Array(10.0)) match {
      case Lof.Scored(score, outlier) =>
        assert(!outlier, s"expected normal, score=$score")
      case other => fail(s"expected Scored, got $other")
    }
  }

  // --- LOF-2: 2-D cluster + outlier, scores pinned from a hand-traced run
  // of the reference algorithm (quirks included)
  test("LOF-2: 2-D cluster, (5,5) drift, (1.02,1.0) pass, exact scores") {
    val baseline = IndexedSeq(
      Array(1.0, 1.0), Array(1.1, 1.0), Array(0.9, 1.1), Array(1.0, 0.9))
    val m = Lof.Model(baseline)
    val far = m.predict(Array(5.0, 5.0)).asInstanceOf[Lof.Scored]
    assert(far.outlier)
    assert(math.abs(far.score - 66.94148369069599) < 1e-9, s"got ${far.score}")
    val near = m.predict(Array(1.02, 1.0)).asInstanceOf[Lof.Scored]
    assert(!near.outlier)
    assert(math.abs(near.score - 0.8943874303465154) < 1e-9, s"got ${near.score}")
  }

  // --- LOF-3: warm-up — fewer than k baseline points ⇒ no verdict
  test("LOF-3: baseline of 2 points → Skipped (warm-up / knn minimal)") {
    val m = Lof.Model(IndexedSeq(Array(1.0), Array(2.0)))
    assert(m.predict(Array(3.0)) == Lof.Skipped)
    assert(Lof.Model(IndexedSeq.empty).predict(Array(3.0)) == Lof.Skipped)
  }

  test("skipItems warm-up guard (manager.go:374-379)") {
    val pts = IndexedSeq(Array(1.0), Array(2.0), Array(3.0), Array(4.0))
    assert(Lof.Model(pts, skipItems = 10).predict(Array(1.5)) == Lof.Skipped)
    assert(Lof.Model(pts, skipItems = 4).predict(Array(1.5)) != Lof.Skipped)
  }

  // --- quirk A4: kDistance takes the NEAREST of a 3-NN query
  test("quirk: kDistance = distance to nearest neighbor, not k-th") {
    val m = Lof.Model(IndexedSeq(Array(0.0), Array(5.0), Array(20.0)))
    // nearest of {0,5,20} to 1 is 0 → kDistance = 1 (NOT 19, the 3rd-NN dist)
    assert(m.kDistance(Array(1.0)) == 1.0)
  }

  // --- quirk A3: reachabilityDist uses kDist of the QUERY
  test("quirk: reachabilityDist = max(kDist(query), dist(query, other))") {
    val m = Lof.Model(IndexedSeq(Array(0.0), Array(5.0), Array(20.0)))
    // kDist(1) = 1; dist(1, 5) = 4 → reach = max(1, 4) = 4
    assert(m.reachabilityDist(Array(1.0), Array(5.0)) == 4.0)
    // dist(1, 0.5) = 0.5 < kDist → reach = kDist = 1
    assert(m.reachabilityDist(Array(1.0), Array(0.5)) == 1.0)
  }

  test("lrd divides by k unconditionally (lof.go:137,207)") {
    // 3 identical points: knn of a member returns itself + 2 others, dist 0
    val m = Lof.Model(IndexedSeq(Array(10.0), Array(10.0), Array(10.0)))
    // all reach dists are 0 → lrd = 1/(0/3) = +Inf; lof(10) = (Inf*3/3)/Inf = NaN
    val score = m.lof(Array(10.0))
    // reference: avgLrd/lrd = Inf/Inf = NaN; NaN > 1 is false → not outlier
    assert(score.isNaN || score <= Lof.Threshold)
  }

  test("permutation invariance of the baseline set (no ties)") {
    val base = IndexedSeq(Array(1.0, 2.0), Array(3.0, 1.0), Array(0.5, 0.1),
      Array(2.0, 2.5), Array(4.0, 4.0))
    val q = Array(2.2, 1.9)
    val s1 = Lof.Model(base).lof(q)
    val s2 = Lof.Model(base.reverse).lof(q)
    val s3 = Lof.Model(IndexedSeq(base(2), base(0), base(4), base(1), base(3))).lof(q)
    assert(s1 == s2 && s2 == s3)
  }
}
