package graft.engine.sketch

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable KLL quantile sketch aggregation (DataSketches 6.2, on the Spark
  * classpath — SURVEY §4.2).
  *
  * Why this exists next to `percentile_approx`: the built-in returns a
  * finalized number per group within ONE job, but ledger-resumed runs need
  * per-partition sketch ROWS that can be (a) persisted, (b) merged across
  * separate job runs, and (c) merged up to table-level quantiles without
  * re-reading data. KLL is mergeable and deterministic for a fixed insert
  * order-set (merge is order-insensitive for rank queries at our accuracy).
  *
  * Implemented as a typed `Aggregator` registered via `udaf()`. The buffer
  * is the LIVE sketch object (wrapped for Java serialization), not its byte
  * image: Spark's ScalaAggregator is a TypedImperativeAggregate that keeps
  * the buffer deserialized between rows, so `reduce` is a plain
  * `sketch.update(v)` — the encoder (bytes via `toByteArray`) runs only at
  * shuffle/spill boundaries. A byte-array buffer would force a
  * heapify → update → toByteArray round-trip on EVERY input row inside the
  * flagship stats pass (measured dominant cost at 16M rows).
  */
object KllAgg {

  // Determinism note: a KLL sketch is EXACT (and therefore bit-stable) while
  // a group holds ≤ k values; beyond that, compaction picks a randomized
  // offset, so sketch BYTES and the last ulps of quantiles can differ across
  // runs while staying inside the ~1.65% rank-error bound. Violation/verdict
  // outputs stay byte-identical (they never embed sketch bytes); column_stats
  // sketch blobs are rank-accurate, not bit-stable. Tests compare
  // sketch-derived quantiles with an error-bound tolerance.
  val K: Int = 200 // DataSketches default; ~1.65% rank error, mergeable

  /** Mutable sketch holder; Java-serializes as the sketch's compact byte
    * image (KllDoublesSketch itself is not Serializable). `sketch` is null
    * until the first update.
    */
  final class KllBuf(@transient var sketch: KllDoublesSketch) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = if (sketch == null) Array.emptyByteArray else sketch.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sketch = if (n == 0) null else KllDoublesSketch.heapify(Memory.wrap(bytes))
    }
  }

  /** Shared Aggregator skeleton: both the value aggregator and the sketch
    * merger differ ONLY in how one input lands in the live sketch — zero /
    * merge / finish / encoders must stay identical or table-level rollups
    * would diverge from per-partition sketches.
    */
  sealed abstract class KllAggBase[IN](k: Int)
      extends Aggregator[IN, KllBuf, Array[Byte]] with Serializable {

    protected def emptyInput(in: IN): Boolean
    protected def updateWith(sketch: KllDoublesSketch, in: IN): Unit

    final def zero: KllBuf = new KllBuf(null)

    final def reduce(buf: KllBuf, in: IN): KllBuf = {
      if (!emptyInput(in)) {
        if (buf.sketch == null) buf.sketch = KllDoublesSketch.newHeapInstance(k)
        updateWith(buf.sketch, in)
      }
      buf
    }

    final def merge(a: KllBuf, b: KllBuf): KllBuf =
      if (a.sketch == null) b
      else if (b.sketch == null) a
      else { a.sketch.merge(b.sketch); a }

    final def finish(buf: KllBuf): Array[Byte] =
      if (buf.sketch == null) Array.emptyByteArray else buf.sketch.toByteArray

    final def bufferEncoder: Encoder[KllBuf] = Encoders.javaSerialization[KllBuf]
    final def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class KllDoubleAggregator(k: Int = K) extends KllAggBase[Option[Double]](k) {
    protected def emptyInput(in: Option[Double]): Boolean = in.isEmpty
    protected def updateWith(sketch: KllDoublesSketch, in: Option[Double]): Unit =
      sketch.update(in.get)
  }

  /** Column aggregate: binary KLL sketch of a nullable double column. */
  def kllSketch(col: Column, k: Int = K): Column = {
    val f = udaf(new KllDoubleAggregator(k))
    f(col)
  }

  /** Merges already-serialized KLL sketches (binary column) into one sketch
    * — the aggregation half of the resume story: per-partition sketch ROWS
    * persisted by one run are rolled up to table level by a later run
    * without touching the data.
    */
  final class KllMergeAggregator(k: Int = K) extends KllAggBase[Array[Byte]](k) {
    protected def emptyInput(in: Array[Byte]): Boolean = in == null || in.isEmpty
    protected def updateWith(sketch: KllDoublesSketch, in: Array[Byte]): Unit =
      sketch.merge(KllDoublesSketch.heapify(Memory.wrap(in)))
  }

  /** Column aggregate: union of binary KLL sketches. */
  def kllSketchMerge(col: Column, k: Int = K): Column = {
    val f = udaf(new KllMergeAggregator(k))
    f(col)
  }

  // ---- driver-side sketch ops (for reading back persisted sketch rows) ----

  def quantile(bytes: Array[Byte], q: Double): Double = {
    if (bytes == null || bytes.isEmpty) return Double.NaN
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (s.isEmpty) Double.NaN else s.getQuantile(q)
  }

  def mergeAll(sketches: Iterable[Array[Byte]], k: Int = K): Array[Byte] = {
    val acc = KllDoublesSketch.newHeapInstance(k)
    sketches.foreach { b =>
      if (b != null && b.nonEmpty) acc.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    }
    acc.toByteArray
  }

  def count(bytes: Array[Byte]): Long =
    if (bytes == null || bytes.isEmpty) 0L
    else KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}
