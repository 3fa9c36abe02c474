package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  *
  * Decode is REAL wherever pure JDK / deterministic byte reading can do it:
  *  - IMAGES: PNG/JPEG/GIF/BMP sniffed by magic bytes, true dimensions read
  *    header-only via `javax.imageio` (ships in the JDK).
  *  - AUDIO: WAV/RIFF headers parsed directly ([[decodeWavMeta]]) — sample
  *    rate, channels, duration from the fmt/data chunks.
  *  - VIDEO: MP4 `moov/mvhd` duration parsed directly ([[decodeMp4Meta]]).
  * Codec-level decode (pixels, PCM resample, frame extraction) would need
  * external media libs and remains a documented STUB ([[fakeDecode]] derives
  * deterministic pseudo-metadata from a content hash); everything around it
  * — schema, partition-wise batching, typed Dataset plumbing, downstream
  * aggregation — is real and tested, so swapping in a real codec stage
  * (javacv, or a Pandas-UDF stage in PySpark) is a one-function change.
  */
object Multimodal {

  final case class MediaMeta(
      url: String,
      n_bytes: Long,
      sha256: String,
      width: Int, // real for PNG/JPEG/GIF/BMP; content-hash fake otherwise
      height: Int,
      mean_byte: Double,
      format: String, // "png"/"jpeg"/"wav"/"mp4"… from real parsing; "fake" otherwise
      sample_rate: Int = 0, // real for WAV; 0 otherwise
      channels: Int = 0, // real for WAV; 0 otherwise
      duration_ms: Long = 0L // real for WAV/MP4; 0 otherwise
  )

  /** Header-only image decode for formats the JDK understands. Returns
    * (width, height, format) or None for non-image payloads. Magic-byte
    * sniff first so arbitrary binaries skip ImageIO entirely.
    */
  def decodeImageDims(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.length < 8) return None
    def b(i: Int) = bytes(i) & 0xff
    val looksImage =
      (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // png
        (b(0) == 0xff && b(1) == 0xd8) || // jpeg
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') || // gif
        (b(0) == 'B' && b(1) == 'M') // bmp
    if (!looksImage) return None
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          // getWidth/getHeight(0) parse only the header, never the pixels
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
      // NonFatal, not just IOException: JDK readers throw IllegalArgument /
      // ArrayIndexOutOfBounds on malformed headers that pass the magic
      // sniff — one corrupt crawl payload must fall back to the fake, not
      // kill the whole pass (this is a data-quality engine over untrusted
      // bytes).
    } catch { case scala.util.control.NonFatal(_) => None } finally in.close()
  }

  /** REAL WAV/RIFF header parse: (sampleRate, channels, durationMs) from the
    * fmt and data chunks — ~30 lines of deterministic little-endian byte
    * reading, no libs. Duration = dataBytes·1000/byteRate (floor). Returns
    * None for non-WAV or malformed payloads (untrusted bytes: every read is
    * bounds-checked and NonFatal-guarded by the caller chain).
    */
  def decodeWavMeta(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var byteRate = 0L
    var dataLen = -1L
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val sz = le32(pos + 4)
      if (id == "fmt " && pos + 24 <= bytes.length) {
        channels = le16(pos + 10)
        sampleRate = le32(pos + 12).toInt
        byteRate = le32(pos + 16)
      } else if (id == "data" && dataLen < 0) {
        // header size may exceed the (truncated) payload; trust what's there
        dataLen = math.min(sz, (bytes.length - pos - 8).toLong)
      }
      // advance in Long: a hostile u32 chunk size must not wrap the Int
      // cursor into a negative index. A declared size past the end of the
      // payload (truncated file, or hostile tail chunk) just ends the walk —
      // whatever was parsed so far stands.
      val next = pos.toLong + 8L + sz + (sz & 1L) // RIFF chunks are word-aligned
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    if (sampleRate <= 0 || channels <= 0 || byteRate <= 0 || dataLen < 0) None
    else Some((sampleRate, channels, dataLen * 1000L / byteRate))
  }

  /** REAL MP4 duration parse: walk the top-level boxes (BE u32 size + 4cc),
    * require a leading `ftyp`, find `moov`, read `mvhd`'s timescale/duration
    * (v0: u32s; v1: u64 duration). Returns duration in ms, None otherwise.
    */
  def decodeMp4Meta(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 16) return None
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (tag(4) != "ftyp") return None
    // walk boxes in [from, to) looking for `name`; returns payload offset+size
    def findBox(from: Int, to: Int, name: String): Option[(Int, Int)] = {
      var pos = from
      while (pos + 8 <= to) {
        val sz = u32(pos)
        if (sz < 8 || pos + sz > to) return None // malformed/hostile
        if (tag(pos + 4) == name) return Some((pos + 8, (sz - 8).toInt))
        pos += sz.toInt
      }
      None
    }
    for {
      (moovOff, moovLen) <- findBox(0, bytes.length, "moov")
      (mvhdOff, mvhdLen) <- findBox(moovOff, moovOff + moovLen, "mvhd")
      if mvhdLen >= 24
      version = bytes(mvhdOff) & 0xff
      (timescale, duration) <-
        (if (version == 0) Some((u32(mvhdOff + 12), u32(mvhdOff + 16)))
         else if (version == 1 && mvhdLen >= 32)
           Some((u32(mvhdOff + 20), u64(mvhdOff + 24)))
         else None)
      if timescale > 0
      // a v1 u64 duration can be negative-as-Long or overflow the ms
      // multiply — malformed metadata must fall to None, not flow on as a
      // garbage negative duration
      if duration >= 0 && duration <= Long.MaxValue / 1000L
    } yield duration * 1000L / timescale
  }

  /** STUB decoder — deterministic fake. A real implementation would parse the
    * container header; the fake derives plausible dimensions from a content
    * hash so tests exercise realistic value ranges.
    */
  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def fakeDecode(url: String, bytes: Array[Byte]): MediaMeta = {
    val md = MessageDigest.getInstance("SHA-256")
    val digest = md.digest(bytes)
    val hex = toHex(digest)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    val w = 160 + (((digest(0) & 0xff) << 8 | (digest(1) & 0xff)) % 1760)
    val h = 90 + (((digest(2) & 0xff) << 8 | (digest(3) & 0xff)) % 990)
    MediaMeta(url, bytes.length.toLong, hex, w, h, mean, "fake")
  }

  /** Real-first decode: true dims for JDK-decodable images, true header
    * metadata for WAV/MP4 containers, deterministic fake for everything
    * else. NonFatal-guarded per family: one corrupt crawl payload falls back
    * to the fake, never kills the pass.
    */
  def decode(url: String, bytes: Array[Byte]): MediaMeta = {
    def guarded[T](f: => Option[T]): Option[T] =
      try f catch { case scala.util.control.NonFatal(_) => None }
    lazy val base = fakeDecode(url, bytes) // hash/size/mean math, shared
    guarded(decodeImageDims(bytes))
      .map { case (w, h, fmt) => base.copy(width = w, height = h, format = fmt) }
      .orElse(guarded(decodeWavMeta(bytes)).map { case (sr, ch, ms) =>
        base.copy(width = 0, height = 0, format = "wav",
          sample_rate = sr, channels = ch, duration_ms = ms)
      })
      .orElse(guarded(decodeMp4Meta(bytes)).map(ms =>
        base.copy(width = 0, height = 0, format = "mp4", duration_ms = ms)))
      .getOrElse(base)
  }

  /** Codec plug point: the pipeline (schema, batching, aggregation) is
    * decoder-agnostic — inject a real codec stage (javacv, a Pandas-UDF
    * bridge) here without touching [[decodeMeta]] or anything downstream.
    * Implementations MUST be Serializable (the instance ships to executors)
    * and total over untrusted bytes (never throw on a corrupt payload —
    * return a fallback meta instead; this is a data-quality engine over
    * crawl bytes).
    */
  trait Decoder extends Serializable {
    def decode(url: String, bytes: Array[Byte]): MediaMeta
  }

  /** Default decoder: real header metadata (image dims / WAV / MP4) with the
    * deterministic fake for codec-level fields — the honest sandbox stub.
    */
  object HeaderDecoder extends Decoder {
    def decode(url: String, bytes: Array[Byte]): MediaMeta =
      Multimodal.decode(url, bytes)
  }

  /** Decode of (key, url, payload) rows — one [[MediaMeta]] struct per row.
    * The grouping key rides along so no join-back is needed (urls may
    * legitimately duplicate; a join on url would multiply rows).
    *
    * r6: a deterministic struct-returning UDF, not the former typed
    * `mapPartitions`. The typed map was an OPAQUE operator (guide §4.1):
    * it forced a full row decode→Scala-tuple→re-encode round trip AND
    * blocked column pruning — a downstream consumer that touches no meta
    * field (m_media_bytes' row counting, a partition-cardinality probe)
    * still paid sha256 + byte scans over every payload. As an expression
    * the decode prunes like any projection (unused → never runs, reaches
    * the scan as a column prune) and subexpression elimination collapses
    * the 10 field extractions to ONE decoder call per row. The decoder
    * instance still ships once per task in the UDF closure.
    */
  def decodeMeta(df: DataFrame, keyCol: String, urlCol: String, binCol: String,
      decoder: Decoder = HeaderDecoder): DataFrame = {
    val f = udf((u: String, b: Array[Byte]) =>
      decoder.decode(u, if (b == null) Array.emptyByteArray else b))
    df.select(col(keyCol).as("partition"),
        f(col(urlCol), col(binCol)).as("meta"))
      .select(col("partition"), col("meta.*"))
  }

  /** STUB resize: a real implementation would decode → scale → re-encode;
    * the fake deterministically derives the resized payload (so schema,
    * sizing math and plumbing are testable without media libs). Target box
    * semantics: aspect-preserving fit into (maxW, maxH).
    */
  def fakeResize(meta: MediaMeta, maxW: Int, maxH: Int): MediaMeta = {
    // resize is image semantics: audio/video metas carry width=height=0
    // (real WAV/MP4 header parse) and must pass through untouched, not
    // divide by zero in the area ratio below
    if (meta.width <= 0 || meta.height <= 0) return meta
    val scale = math.min(1.0, math.min(maxW.toDouble / meta.width, maxH.toDouble / meta.height))
    val w = math.max(1, (meta.width * scale).toInt)
    val h = math.max(1, (meta.height * scale).toInt)
    // fake payload size shrinks with area ratio (real: re-encoded bytes)
    val bytes = math.max(1L, (meta.n_bytes * (w.toLong * h) / (meta.width.toLong * meta.height)))
    meta.copy(width = w, height = h, n_bytes = bytes)
  }

  /** STUB frame sampling for video payloads: deterministic frame indices
    * (every `stride`-th of `nFrames` fake frames derived from content hash).
    * Returns (url, frame_idx) rows — the explode shape a real sampler needs.
    */
  def frameSampleIndices(meta: MediaMeta, stride: Int): Seq[(String, Int)] = {
    val nFrames = 1 + (java.lang.Long.parseLong(meta.sha256.take(4), 16) % 300).toInt
    (0 until nFrames by stride).map(i => (meta.url, i))
  }

  /** Resize stage over decoded metadata (Dataset transform, typed). */
  def resizeAll(meta: DataFrame, maxW: Int = 640, maxH: Int = 360): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.select(col("partition"), col("url"), col("n_bytes"), col("sha256"),
        col("width"), col("height"), col("mean_byte"), col("format"))
      .as[(String, String, Long, String, Int, Int, Double, String)]
      .map { case (p, u, n, sha, w, h, m, f) =>
        val r = fakeResize(MediaMeta(u, n, sha, w, h, m, f), maxW, maxH)
        (p, r.url, r.n_bytes, r.sha256, r.width, r.height, r.mean_byte, r.format)
      }
      .toDF("partition", "url", "n_bytes", "sha256", "width", "height",
        "mean_byte", "format")
  }

  /** Aggregate media stats per partition key — the downstream consumer shape. */
  def metaStats(meta: DataFrame): DataFrame =
    meta.groupBy(col("partition"))
      .agg(
        count(lit(1)).as("n_media"),
        round(avg(col("n_bytes")), 4).as("avg_bytes"),
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
        min(col("width")).as("min_width"),
        max(col("height")).as("max_height"))
}
