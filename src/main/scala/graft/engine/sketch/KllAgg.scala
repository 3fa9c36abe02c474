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
  * Implemented as a typed `Aggregator` registered via `udaf()` (SURVEY §7.4
  * chose Aggregator over a Catalyst TypedImperativeAggregate: no private
  * Spark APIs, Kryo-free byte-array buffers, and the per-row serialization
  * cost is avoided by Spark's ObjectAggregationIterator keeping the buffer
  * deserialized within a partition).
  */
object KllAgg {

  val K: Int = 200 // DataSketches default; ~1.65% rank error, mergeable

  /** Buffer = serialized sketch bytes (encoder-friendly); null = empty. */
  final class KllDoubleAggregator(k: Int = K)
      extends Aggregator[Option[Double], Array[Byte], Array[Byte]]
      with Serializable {

    private def sketchOf(b: Array[Byte]): KllDoublesSketch =
      if (b == null || b.isEmpty) KllDoublesSketch.newHeapInstance(k)
      else KllDoublesSketch.heapify(Memory.wrap(b))

    def zero: Array[Byte] = Array.emptyByteArray

    def reduce(buf: Array[Byte], in: Option[Double]): Array[Byte] = in match {
      case Some(v) =>
        val s = sketchOf(buf)
        s.update(v)
        s.toByteArray
      case None => buf
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a == null || a.isEmpty) return b
      if (b == null || b.isEmpty) return a
      val s = sketchOf(a)
      s.merge(sketchOf(b))
      s.toByteArray
    }

    def finish(buf: Array[Byte]): Array[Byte] =
      if (buf == null) Array.emptyByteArray else buf

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column aggregate: binary KLL sketch of a nullable double column. */
  def kllSketch(col: Column, k: Int = K): Column = {
    val f = udaf(new KllDoubleAggregator(k))
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
