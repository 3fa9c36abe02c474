package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fixtures.WebGen

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def pages = WebGen.generate(spark, 200)
    .withColumnRenamed("p_day", "partition")

  test("decodeMeta: deterministic metadata, counts preserved, no join-back") {
    val meta = Multimodal.decodeMeta(pages, "partition", "url", "html")
    assert(meta.count() == 200)
    val a = meta.orderBy("url").select("sha256").as[String].collect()
    val b = Multimodal.decodeMeta(pages, "partition", "url", "html")
      .orderBy("url").select("sha256").as[String].collect()
    assert(a.sameElements(b))
    // n_bytes equals the actual html byte length
    val row = meta.orderBy("url").select("url", "n_bytes").limit(1).collect().head
    val htmlLen = pages.where(col("url") === row.getString(0))
      .select(length(col("html"))).collect().head.getInt(0)
    assert(row.getLong(1) == htmlLen)
  }

  test("a custom Decoder injects without touching the pipeline (codec plug point)") {
    // a toy codec stage standing in for javacv / a Pandas-UDF bridge: the
    // same plumbing (schema, partition batching, downstream agg) must carry
    // its output unchanged
    object ToyDecoder extends Multimodal.Decoder {
      def decode(url: String, bytes: Array[Byte]): Multimodal.MediaMeta =
        Multimodal.MediaMeta(url, bytes.length.toLong, "toy-sha", 7, 9, 0.5,
          "toycodec", sample_rate = 44100, channels = 2, duration_ms = 1234L)
    }
    val meta = Multimodal.decodeMeta(pages, "partition", "url", "html", ToyDecoder)
    assert(meta.count() == 200)
    assert(meta.select("format").distinct().as[String].collect().toSeq ==
      Seq("toycodec"))
    assert(meta.where(col("width") === 7 && col("height") === 9 &&
      col("duration_ms") === 1234L).count() == 200)
    // downstream aggregation consumes the injected decoder's output as-is
    val stats = Multimodal.metaStats(meta)
    assert(stats.select("min_width").as[Int].collect().forall(_ == 7))
    // and the DEFAULT decoder path is unchanged by the plug point's existence
    val dflt = Multimodal.decodeMeta(pages, "partition", "url", "html")
    assert(dflt.where(col("format") === "toycodec").count() == 0)
  }

  test("metaStats aggregates per partition") {
    val meta = Multimodal.decodeMeta(pages, "partition", "url", "html")
    val stats = Multimodal.metaStats(meta)
    assert(stats.agg(sum("n_media")).collect().head.getLong(0) == 200)
  }

  test("fakeResize: aspect-preserving fit, never upscales") {
    val m = Multimodal.MediaMeta("u", 100000, "ab" * 32, 1920, 1080, 12.0, "fake")
    val r = Multimodal.fakeResize(m, 640, 360)
    assert(r.width == 640 && r.height == 360)
    assert(r.n_bytes < m.n_bytes)
    val small = Multimodal.MediaMeta("u", 1000, "cd" * 32, 320, 180, 1.0, "fake")
    val r2 = Multimodal.fakeResize(small, 640, 360)
    assert(r2.width == 320 && r2.height == 180) // no upscale
  }

  test("real image decode: PNG and JPEG dims read from actual headers") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val m1 = Multimodal.decode("u1", png(123, 45))
    assert(m1.width == 123 && m1.height == 45 && m1.format == "png")
    val m2 = Multimodal.decode("u2", jpeg(64, 32))
    assert(m2.width == 64 && m2.height == 32 && m2.format.startsWith("jp"))
    // non-image bytes fall back to the documented deterministic fake
    val m3 = Multimodal.decode("u3", "<html>not an image</html>".getBytes("UTF-8"))
    assert(m3.format == "fake")
    // bytes that PASS the magic sniff but have corrupt headers must fall
    // back too, not throw (JDK readers raise RuntimeExceptions here)
    for (magic <- Seq(Array[Byte]('B', 'M'), Array[Byte]('G', 'I', 'F', '8'),
        Array[Byte](0x89.toByte, 'P', 'N', 'G'), Array[Byte](0xff.toByte, 0xd8.toByte))) {
      val corrupt = magic ++ Array.fill[Byte](12)(0x7f)
      assert(Multimodal.decode("u4", corrupt).format == "fake",
        s"corrupt ${magic.toSeq} payload did not fall back")
    }
    // distributed path: dims survive the mapPartitions plumbing
    val df = Seq(("p", "img1", png(20, 10)), ("p", "img2", png(7, 9)))
      .toDF("partition", "url", "payload")
    val meta = Multimodal.decodeMeta(df, "partition", "url", "payload")
      .orderBy("url").select("width", "height", "format")
      .as[(Int, Int, String)].collect().toSeq
    assert(meta == Seq((20, 10, "png"), (7, 9, "png")))
  }

  test("real WAV decode: RIFF header metadata read back from javax.sound output") {
    def wav(sampleRate: Int, chans: Int, frames: Int): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(sampleRate.toFloat, 16, chans, true, false)
      val pcm = Array.tabulate[Byte](frames * chans * 2)(i => (i * 7).toByte)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // the encoder (javax.sound) is independent of the parser (our bytes)
    val m = Multimodal.decode("a1", wav(16000, 2, 8000))
    assert(m.format == "wav" && m.sample_rate == 16000 && m.channels == 2)
    assert(m.duration_ms == 500L, s"8000 frames @16kHz = 500ms, got ${m.duration_ms}")
    assert(m.width == 0 && m.height == 0) // honest: audio has no dims
    val mono = Multimodal.decode("a2", wav(8000, 1, 12000))
    assert(mono.sample_rate == 8000 && mono.channels == 1 && mono.duration_ms == 1500L)
    // truncated header / RIFF-but-garbage payloads fall back, never throw
    assert(Multimodal.decode("a3", wav(8000, 1, 100).take(20)).format == "fake")
    val riffGarbage = "RIFF1234WAVE".getBytes("US-ASCII") ++ Array.fill[Byte](40)(0x7f)
    assert(Multimodal.decode("a4", riffGarbage).format == "fake")
  }

  test("real MP4 decode: moov/mvhd duration, v0 and v1, hostile sizes safe") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ name.getBytes("US-ASCII") ++ payload
    def mp4(version: Int, timescale: Long, duration: Long): Array[Byte] = {
      val mvhd =
        if (version == 0)
          Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
            be32(timescale) ++ be32(duration) ++ Array.fill[Byte](80)(0)
        else
          Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) ++
            be32(timescale) ++ be32(duration >> 32) ++ be32(duration & 0xffffffffL) ++
            Array.fill[Byte](80)(0)
      box("ftyp", "isom0000".getBytes("US-ASCII")) ++ box("moov", box("mvhd", mvhd))
    }
    val m0 = Multimodal.decode("v1", mp4(0, 1000, 90500))
    assert(m0.format == "mp4" && m0.duration_ms == 90500L, m0.toString)
    val m1 = Multimodal.decode("v2", mp4(1, 600, 1200))
    assert(m1.format == "mp4" && m1.duration_ms == 2000L, m1.toString)
    // hostile: box size larger than the payload → fake, no crash/overread
    val hostile = box("ftyp", "isom".getBytes) ++ be32(0x7fffffffL) ++ "moov".getBytes
    assert(Multimodal.decode("v3", hostile).format == "fake")
  }

  test("audio/video metas (width=height=0) pass through resize untouched") {
    // a decoded WAV/MP4 meta has no dims; the resize area-ratio math must
    // not divide by zero — the row passes through unchanged
    val wavMeta = Multimodal.MediaMeta("a", 1000, "00" * 32, 0, 0, 1.0, "wav",
      sample_rate = 16000, channels = 2, duration_ms = 500L)
    assert(Multimodal.fakeResize(wavMeta, 100, 100) == wavMeta)
  }

  test("hostile RIFF chunk size cannot wrap the walk cursor") {
    // valid fmt chunk first, then a trailing chunk declaring ~Int.MaxValue
    // bytes: the walk must stop at the payload end and keep what it parsed,
    // not index the array at a negative offset
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(16000) ++ le32(64000) ++ le16(4) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(64) ++ Array.fill[Byte](64)(1)
    val hostileTail = "junk".getBytes("US-ASCII") ++ le32(0x7fffffe0L) ++ Array.fill[Byte](8)(0)
    val body = fmt ++ data ++ hostileTail
    val riff = "RIFF".getBytes("US-ASCII") ++ le32(body.length + 4L) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val parsed = Multimodal.decodeWavMeta(riff)
    assert(parsed.contains((16000, 2, 1L)), s"got $parsed") // 64B @64kB/s = 1ms
  }

  test("v1 mvhd with overflowing u64 duration falls back, not negative ms") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ name.getBytes("US-ASCII") ++ payload
    val huge = 0x2000000000000000L // duration * 1000 overflows Long
    val mvhd = Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) ++
      be32(600) ++ be32(huge >> 32) ++ be32(huge & 0xffffffffL) ++
      Array.fill[Byte](80)(0)
    val payload = box("ftyp", "isom0000".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", mvhd))
    assert(Multimodal.decodeMp4Meta(payload).isEmpty)
    val m = Multimodal.decode("v", payload)
    assert(m.format == "fake" && m.duration_ms >= 0, m.toString)
  }

  test("resizeAll pipeline keeps schema and row count") {
    val meta = Multimodal.decodeMeta(pages, "partition", "url", "html")
    val resized = Multimodal.resizeAll(meta, 100, 100)
    assert(resized.count() == 200)
    assert(resized.agg(max("width")).collect().head.getInt(0) <= 100)
  }

  test("frameSampleIndices: deterministic stride sampling") {
    val m = Multimodal.MediaMeta("u", 1000, "ff00" + "ab" * 30, 640, 360, 1.0, "fake")
    val frames = Multimodal.frameSampleIndices(m, stride = 10)
    assert(frames.nonEmpty)
    assert(frames.forall(_._2 % 10 == 0))
    assert(frames == Multimodal.frameSampleIndices(m, stride = 10))
  }
}
