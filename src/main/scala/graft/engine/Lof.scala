package graft.engine

/** Reference-exact Local Outlier Factor scorer.
  *
  * This is a faithful re-implementation (NOT a translation — the data
  * structures are plain Scala; only the arithmetic and its quirks are pinned)
  * of the reference's LOF semantics, used by the drift check over small
  * per-partition profile vectors (SURVEY §2.4 A1-A4, §7.4). It is deliberately
  * a driver-side/executor-local function, not a distributed op: drift scoring
  * operates on O(#partitions) aggregated profile vectors, never on raw rows.
  *
  * Reference behaviors reproduced exactly (see /root/reference):
  *  - outlier ⇔ LOF > 1                      (internal/predictor/lof/lof.go:15,161-164)
  *  - kDistance(v) = dist(v, nearest of a 3-NN query) — hardcoded 3, takes
  *    vectors[0] (the NEAREST), not the k-th   (lof.go:175-181)
  *  - reachabilityDist(v, v1) = max(kDistance(v), dist(v, v1)) — uses kDist of
  *    the QUERY v, not of the neighbor as in the LOF paper (lof.go:183-193)
  *  - lrd(v) = 1 / (Σ reachDist / k) — divides by k even if fewer neighbors
  *    (lof.go:195-210, division at :137 analog)
  *  - k-NN errors when fewer than n stored points (knn/brute/brute.go:115-117)
  *  - Predict refuses when model empty or below warm-up skipItems
  *    (lof.go:107-112; dispatcher/manager.go:374-379)
  *  - k-NN candidate ranking ascending by distance (pkg/pqueue/queue.go:81-90);
  *    ties broken by insertion order (we use a stable sort — the reference's
  *    sort.Sort is unstable, but tie behavior only matters for exactly
  *    equidistant points, which the fixtures avoid).
  */
object Lof {

  val MinKNum = 3
  val Threshold = 1.0

  final case class DimMismatchException(d1: Int, d2: Int)
      extends RuntimeException(s"points dimension is not equal: $d1 vs $d2")

  /** Euclidean distance, same float-op order as geom/distance.go:10-20
    * (math.Pow(x,2) then running sum, sqrt at the end).
    */
  def euclidean(p: Array[Double], q: Array[Double]): Double = {
    if (p.length != q.length) throw DimMismatchException(p.length, q.length)
    var d = 0.0
    var i = 0
    while (i < p.length) { d += math.pow(p(i) - q(i), 2); i += 1 }
    math.sqrt(d)
  }

  /** Chebyshev, cf. geom/distance.go:22-34. */
  def chebyshev(p: Array[Double], q: Array[Double]): Double = {
    if (p.length != q.length) throw DimMismatchException(p.length, q.length)
    var dist = 0.0
    var i = 0
    while (i < q.length) {
      val a = math.abs(p(i) - q(i))
      if (dist < a) dist = a
      i += 1
    }
    dist
  }

  /** Manhattan, cf. geom/distance.go:36-46. */
  def manhattan(p: Array[Double], q: Array[Double]): Double = {
    if (p.length != q.length) throw DimMismatchException(p.length, q.length)
    var d = 0.0
    var i = 0
    while (i < p.length) { d += math.abs(p(i) - q(i)); i += 1 }
    d
  }

  /** Outcome of a Predict: mirrors Conclusion{Outlier} plus the warm-up skip
    * path, which the new engine surfaces as a verdict status rather than an
    * HTTP error.
    */
  sealed trait Verdict
  case object Skipped extends Verdict // empty model / below warm-up / < k points
  final case class Scored(score: Double, outlier: Boolean) extends Verdict

  /** An immutable baseline model (the "green" snapshot of ST7): brute k-NN
    * over a small point set. Exact — identical results to the reference's
    * brute and kd-tree paths (both exact, SURVEY §2.3 J2).
    */
  final case class Model(
      points: IndexedSeq[Array[Double]],
      k: Int = MinKNum,
      skipItems: Int = 0,
      dist: (Array[Double], Array[Double]) => Double = euclidean
  ) {

    def len: Int = points.length

    /** All stored points ordered by distance to q ascending (stable), first n.
      * Throws when fewer than n stored — "knn less minimal value"
      * (brute.go:115-117).
      */
    def knn(q: Array[Double], n: Int): IndexedSeq[Array[Double]] = {
      if (points.length < n)
        throw new IllegalStateException("knn less minimal value")
      points.zipWithIndex
        .map { case (p, i) => (dist(q, p), i, p) }
        .sortBy(t => (t._1, t._2))
        .take(n)
        .map(_._3)
    }

    /** Quirk A4: distance to the NEAREST of a hardcoded 3-NN (lof.go:175-181). */
    def kDistance(v: Array[Double]): Double = {
      val vectors = knn(v, 3)
      dist(v, vectors(0))
    }

    /** Quirk A3: kDist of the query v, not of the neighbor (lof.go:183-193). */
    def reachabilityDist(v: Array[Double], v1: Array[Double]): Double =
      math.max(kDistance(v), dist(v, v1))

    /** lof.go:195-210 — division by k unconditionally. */
    def lrd(v: Array[Double]): Double = {
      val nn = knn(v, k)
      var rSum = 0.0
      nn.foreach { v1 => rSum += reachabilityDist(v, v1) }
      1.0 / (rSum / k.toDouble)
    }

    /** lof.go:124-143 — avg neighbor lrd (÷k unconditionally) over lrd(query). */
    def lof(q: Array[Double]): Double = {
      val nn = knn(q, k)
      var lrdSum = 0.0
      nn.foreach { y => lrdSum += lrd(y) }
      val avgLrd = lrdSum / k.toDouble
      avgLrd / lrd(q)
    }

    /** Predict with the reference's guard rails re-expressed as Skipped
      * (lof.go:107-118; manager.go:374-379 warm-up; validateKNum :168-172).
      */
    def predict(q: Array[Double]): Verdict = {
      if (k < MinKNum) return Skipped
      if (len == 0 || len < skipItems || len < k) Skipped
      else {
        val score = lof(q)
        Scored(score, score > Threshold)
      }
    }
  }
}
