package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpeg = Array(0xFF, 0xD8, 0xFF, 0x10, 0x20).map(_.toByte)
  private val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A).map(_.toByte)
  private val wav = "RIFF1234WAVE".getBytes("UTF-8")
  private val mp4 = Array(0x00, 0x00, 0x00, 0x18, 0x66, 0x74, 0x79, 0x70)
    .map(_.toByte)
  private val junk = "plain text".getBytes("UTF-8")

  private def media = Seq(
    (1L, jpeg), (2L, png), (3L, wav), (4L, mp4), (5L, junk)
  ).toDF("media_id", "content")

  test("mediaFormat sniffs containers from magic bytes") {
    val fmts = media.select($"media_id",
      Multimodal.mediaFormat($"content").as("fmt"))
      .as[(Long, String)].collect().toMap
    assert(fmts == Map(1L -> "jpeg", 2L -> "png", 3L -> "wav",
      4L -> "mp4", 5L -> "unknown"))
  }

  test("mediaMetadata returns size, digest, format") {
    val row = media.filter($"media_id" === 1L)
      .select(Multimodal.mediaMetadata($"content").as("m"))
      .select("m.n_bytes", "m.sha256", "m.fmt").collect()(0)
    assert(row.getInt(0) == 5)
    assert(row.getString(1).length == 64)
    assert(row.getString(2) == "jpeg")
  }

  test("byteHistogramStub: deterministic normalized histogram") {
    // bytes 0,1,0,1 → bins {0: 0.5, 1: 0.5}
    val bin = Array[Byte](0, 1, 0, 1)
    val out = Seq(Tuple1(bin)).toDF("content")
      .select(Multimodal.byteHistogramStub(4)($"content").as("h"))
      .as[Seq[Double]].head()
    assert(out == Seq(0.5, 0.5, 0.0, 0.0))
    assert(math.abs(out.sum - 1.0) < 1e-9)
  }

  test("byteHistogramStub handles empty payloads") {
    val out = Seq(Tuple1(Array.empty[Byte])).toDF("content")
      .select(Multimodal.byteHistogramStub(4)($"content").as("h"))
      .as[Seq[Double]].head()
    assert(out == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("resizeStub truncates or zero-pads to the target size") {
    val out = Seq(Tuple1("abcdef".getBytes("UTF-8")))
      .toDF("content")
      .select(Multimodal.resizeStub(4)($"content").as("r4"),
        Multimodal.resizeStub(8)($"content").as("r8"))
      .as[(Array[Byte], Array[Byte])].head()
    assert(new String(out._1, "UTF-8") == "abcd")
    assert(out._2.length == 8 && out._2(6) == 0 && out._2(7) == 0)
  }

  test("frameSampleStub emits full-size strided frames only") {
    val bytes = (0 until 10).map(_.toByte).toArray // 10 bytes
    val frames = Seq(Tuple1(bytes)).toDF("content")
      .select(Multimodal.frameSampleStub($"content", stride = 4,
        frameSize = 3, maxFrames = 5).as("fr"))
      .as[Seq[Array[Byte]]].head()
    // offsets 0,4,8: frame at 8 has only 2 bytes → dropped
    assert(frames.length == 2)
    assert(frames(0).toSeq == Seq[Byte](0, 1, 2))
    assert(frames(1).toSeq == Seq[Byte](4, 5, 6))
  }

  test("extractFeatures bundles metadata and embedding") {
    val out = Multimodal.extractFeatures(media, "media_id", "content")
    assert(out.columns.toSeq == Seq("media_id", "meta", "embedding"))
    assert(out.count() == 5)
    val emb = out.filter($"media_id" === 3L)
      .select("embedding").as[Seq[Double]].head()
    assert(emb.length == 16)
    // each bin is rounded to 4 decimals → sum drifts up to 16 * 5e-5
    assert(math.abs(emb.sum - 1.0) < 1e-3)
  }

  test("extractFeaturesBatched equals the per-row expression form") {
    val withEdge = media.unionByName(
      Seq((6L, Array.empty[Byte])).toDF("media_id", "content"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("media_id", "meta.n_bytes", "meta.sha256", "meta.fmt",
        "embedding")
      .as[(Long, Option[Int], Option[String], String, Seq[Double])]
      .collect().sortBy(_._1).toSeq
    val perRow = rows(
      Multimodal.extractFeatures(withEdge, "media_id", "content"))
    val batched = rows(
      Multimodal.extractFeaturesBatched(withEdge, "media_id", "content"))
    assert(perRow == batched)
  }

  test("pngDims / wavInfo parse GOLDEN real-file header bytes") {
    // a genuine minimal 1×1 RGBA PNG's first 33 bytes (signature +
    // IHDR with the real CRC 0x1F15C489) — not our builder's output
    val realPng: Array[Byte] = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1F, 0x15, 0xC4, 0x89
    ).map(_.toByte)
    // a genuine canonical 44-byte WAV header: PCM, mono, 8000 Hz,
    // 16-bit, 16000 data bytes (exactly 1 s)
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 16000)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1).putInt(8000).putInt(16000)
    bb.putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(16000)
    val realWav = bb.array()

    val out = Seq((1L, realPng, realWav)).toDF("id", "png", "wav")
      .select(
        Multimodal.pngDims(col("png")).as("p"),
        Multimodal.wavInfo(col("wav")).as("w"))
      .selectExpr("p.width", "p.height", "w.channels", "w.sample_rate",
        "w.bits", "w.duration_ms")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((1L, 1L, 1L, 8000L, 16L, 1000L)))

    // non-matching bytes parse to null structs, not garbage
    val nulls = Seq((1L, "just text".getBytes("UTF-8")))
      .toDF("id", "b")
      .select(Multimodal.pngDims(col("b")).isNull.as("p"),
        Multimodal.wavInfo(col("b")).isNull.as("w"))
      .as[(Boolean, Boolean)].head()
    assert(nulls == ((true, true)))
  }

  test("real PNG codec round-trip is lossless (and a real PNG)") {
    val w = 36; val h = 28
    val pixels = Array.tabulate(w * h)(i => (i * 7 + 3) % 256)
    val png = Multimodal.encodeGrayPng(pixels, w, h)
    // genuinely a PNG: signature + parsable IHDR via the pure-byte
    // header parser (which validates any on-spec file)
    val dims = Seq(Tuple1(png)).toDF("b")
      .select(Multimodal.pngDims(col("b")).as("d"))
      .selectExpr("d.width", "d.height").as[(Long, Long)].head()
    assert(dims == ((w.toLong, h.toLong)))
    // losslessly decodable back to the exact pixels
    assert(Multimodal.decodeGrayPng(png).toSeq == pixels.toSeq)
    // and compressed: zlib'd IDAT of a linear ramp beats raw size
    assert(png.length < w * h)
  }

  test("dHash56 golden value + invariances on tiny fixtures") {
    val w = 9; val h = 7 // 1x1 cells: means are the pixels themselves
    // row pattern alternating up/down: bit c set iff px(c+1) > px(c)
    val row = Array(10, 20, 5, 30, 30, 40, 2, 9, 1)
    val pixels = Array.tabulate(w * h)(i => row(i % w))
    // per row bits: 1,0,1,0,1,0,1,0 -> 0x55 in each of 7 rows
    val expect = (0 until 7).map(r => 0x55L << (r * 8)).reduce(_ | _)
    assert(Multimodal.dHash56(pixels, w, h) == expect)
    // uniform brightness shift leaves the hash unchanged
    val shifted = pixels.map(p => p + 50)
    assert(Multimodal.dHash56(shifted, w, h) == expect)
    // hash is 56-bit: never negative, never uses bits 56+
    assert((expect & ~((1L << 56) - 1)) == 0L)
    // block averaging: 36x28 image of 4x4-constant cells equals the
    // 9x7 image of those cell values
    val big = Array.tabulate(36 * 28) { i =>
      val x = i % 36; val y = i / 36
      row(x / 4) + (y / 4) // slight per-row drift
    }
    val small = Array.tabulate(9 * 7) { i => row(i % 9) + (i / 9) }
    assert(Multimodal.dHash56(big, 36, 28) ==
      Multimodal.dHash56(small, 9, 7))
  }

  test("PCM16 codec round-trip is lossless and on-spec") {
    val samples = Array(0, 1, -1, 32767, -32768, 1234, -4321)
    val wav = Multimodal.encodePcm16(samples, 8000)
    // genuinely a canonical WAV: the independent header parser
    // reads the right stream parameters from it
    val info = Seq(Tuple1(wav)).toDF("b")
      .select(Multimodal.wavInfo(col("b")).as("w"))
      .selectExpr("w.channels", "w.sample_rate", "w.bits")
      .as[(Long, Long, Long)].head()
    assert(info == ((1L, 8000L, 16L)))
    assert(Multimodal.decodePcm16(wav).toSeq == samples.toSeq)
    // non-WAV bytes decode to null, not garbage
    assert(Multimodal.decodePcm16("not audio".getBytes("UTF-8")) == null)
  }

  test("audioFeatures: hand-computed exact-integer golden values") {
    // samples [1,-1,0,2,-3]: signs (zeros dropped) [1,-1,1,-1] → 3
    // crossings; energy floor((1+1+0+4+9)/5)=3; peak 3
    val out = Seq(Tuple1(Seq(1, -1, 0, 2, -3))).toDF("s")
      .select(Multimodal.audioFeatures(col("s")).as("af"))
      .selectExpr("af.n_samples", "af.energy_fx", "af.zcr", "af.peak")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((5L, 3L, 3L, 3L)))
    // degenerate inputs: empty and all-zero arrays
    val zeros = Seq(Tuple1(Seq(0, 0)), Tuple1(Seq.empty[Int]))
      .toDF("s")
      .select(Multimodal.audioFeatures(col("s")).as("af"))
      .selectExpr("af.n_samples", "af.energy_fx", "af.zcr", "af.peak")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(zeros == Set((2L, 0L, 0L, 0L), (0L, 0L, 0L, 0L)))
  }

  test("encode→decode→audioFeatures equals features on raw samples") {
    val df = spark.range(5).select(col("id"),
      org.apache.spark.sql.functions.transform(
        sequence(lit(0), lit(99)),
        i => (((i * i + col("id") * 31) % 4096) - 2048).cast("int"))
        .as("s"))
    val direct = df.select(col("id"),
      Multimodal.audioFeatures(col("s")).as("af"))
    val viaWav = df.select(col("id"), Multimodal.audioFeatures(
      Multimodal.pcmDecodeUdf(
        Multimodal.pcmEncodeUdf(col("s"), lit(8000)))).as("af"))
    assert(direct.collect().toSeq.sortBy(_.getLong(0)) ==
      viaWav.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("resizeGrayArea: exact integer area means; dHash delegates") {
    // 2x scale of a 3x2 image: each target pixel = floor(mean of 2x2)
    val src = Array(
      1, 1, 2, 3, 10, 20,
      1, 2, 3, 4, 30, 41)
    assert(Multimodal.resizeGrayArea(src, 6, 2, 3, 1).toSeq ==
      Seq((1 + 1 + 1 + 2) / 4, (2 + 3 + 3 + 4) / 4,
        (10 + 20 + 30 + 41) / 4))
    // identity resize is a no-op
    assert(Multimodal.resizeGrayArea(src, 6, 2, 6, 2).toSeq == src.toSeq)
    // indivisible dims fail loudly, not silently crop
    intercept[IllegalArgumentException] {
      Multimodal.resizeGrayArea(src, 6, 2, 4, 1)
    }
  }

  test("splitPngs walks chunk extents exactly") {
    val a = Multimodal.encodeGrayPng(
      Array.tabulate(36 * 28)(i => i % 256), 36, 28)
    val b = Multimodal.encodeGrayPng(
      Array.tabulate(36 * 28)(i => (i * 7) % 256), 36, 28)
    val stream = a ++ b
    val frames = Multimodal.splitPngs(stream)
    // byte-exact frame extents — and each decodes independently
    assert(frames.length == 2)
    assert(frames(0).toSeq == a.toSeq && frames(1).toSeq == b.toSeq)
    assert(Multimodal.decodeGrayPng(frames(1)) != null)
    // a truncated trailing frame is dropped, not mis-sliced
    val truncated = a ++ b.take(b.length / 2)
    val tf = Multimodal.splitPngs(truncated)
    assert(tf.length == 1 && tf(0).toSeq == a.toSeq)
    // non-PNG bytes produce no frames
    assert(Multimodal.splitPngs("not a stream".getBytes("UTF-8")).isEmpty)
  }

  test("real JPEG codec: genuine bytes, SOF dims parse, bounded loss") {
    val (w, h) = (36, 28)
    // the q144/q152 image family — gradients with sharp mod-256 wraps,
    // the worst case for DCT ringing among the fixture images
    var worstMax = 0; var worstMeanE4 = 0L; var worstDh = 0
    for (docId <- 0L until 200L) {
      val base = docId - docId % 5; val v = docId % 5
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        val g = ((x * (3 + base % 11) + y * (5 + base % 13) +
          ((x.toLong * y + base) % 17) * 15) % 256).toInt
        if (v > 0 && (x + y * w + v * 13) % 101 == 0) (g + 128) % 256 else g
      }
      val jpg = Multimodal.encodeGrayJpeg(px, w, h, 0.9f)
      // genuine JFIF stream: SOI marker, and the JDK's own reader
      // opens it (any reader would)
      assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8)
      // pure byte-math SOF walk finds the real encoder's frame header
      assert(Multimodal.jpegDims(jpg).toSeq == Seq(w, h))
      val dec = Multimodal.decodeGrayJpeg(jpg)
      assert(dec.length == w * h)
      val diffs = px.zip(dec).map { case (a, b) => math.abs(a - b) }
      worstMax = math.max(worstMax, diffs.max)
      worstMeanE4 =
        math.max(worstMeanE4, diffs.map(_.toLong).sum * 10000 / diffs.length)
      worstDh = math.max(worstDh, java.lang.Long.bitCount(
        Multimodal.dHash56(px, w, h) ^ Multimodal.dHash56(dec, w, h)))
    }
    // measured at q=0.9: max 20, mean 3.2, dHash 6 — bands leave
    // headroom for encoder drift while staying far inside the q152
    // oracle bound (48) and the near-dup band budget
    assert(worstMax <= 32, s"max abs err $worstMax")
    assert(worstMeanE4 <= 80000L, s"mean err e4 $worstMeanE4")
    assert(worstDh <= 10, s"dHash dist $worstDh")
  }

  test("jpegDims walks markers, rejects non-JPEG, survives padding") {
    // hand-built marker stream: SOI, APP0 (JFIF), COM, then SOF0
    val bb = java.nio.ByteBuffer.allocate(64)
    bb.put(Array(0xFF, 0xD8).map(_.toByte)) // SOI
    bb.put(Array(0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46).map(_.toByte)) // APP0
    bb.put(Array(0xFF, 0xFE, 0x00, 0x03, 0x21).map(_.toByte)) // COM
    bb.put(Array(0xFF, 0xC0, 0x00, 0x0B, 0x08).map(_.toByte)) // SOF0, prec 8
    bb.putShort(300.toShort).putShort(500.toShort) // height 300, width 500
    bb.put(Array(0x01, 0x01, 0x11, 0x00).map(_.toByte))
    assert(Multimodal.jpegDims(bb.array()).toSeq == Seq(500, 300))
    // DHT (0xC4) in the SOF range must NOT be read as a frame header
    val bb2 = java.nio.ByteBuffer.allocate(64)
    bb2.put(Array(0xFF, 0xD8).map(_.toByte))
    bb2.put(Array(0xFF, 0xC4, 0x00, 0x04, 0x00, 0x00).map(_.toByte)) // DHT
    bb2.put(Array(0xFF, 0xC2, 0x00, 0x0B, 0x08).map(_.toByte)) // SOF2 (prog.)
    bb2.putShort(77.toShort).putShort(99.toShort)
    bb2.put(Array(0x01, 0x01, 0x11, 0x00).map(_.toByte))
    assert(Multimodal.jpegDims(bb2.array()).toSeq == Seq(99, 77))
    // 0xFF fill bytes before a marker are legal padding (T.81
    // B.1.1.2) — the walk must skip the run, not parse it as a marker
    val bb3 = java.nio.ByteBuffer.allocate(64)
    bb3.put(Array(0xFF, 0xD8).map(_.toByte))
    bb3.put(Array(0xFF, 0xFF, 0xFF).map(_.toByte)) // fill run
    bb3.put(Array(0xC0, 0x00, 0x0B, 0x08).map(_.toByte)) // SOF0 after fill
    bb3.putShort(12.toShort).putShort(34.toShort)
    bb3.put(Array(0x01, 0x01, 0x11, 0x00).map(_.toByte))
    assert(Multimodal.jpegDims(bb3.array()).toSeq == Seq(34, 12))
    // standalone TEM (0x01) carries no length and must be stepped over
    val bb4 = java.nio.ByteBuffer.allocate(64)
    bb4.put(Array(0xFF, 0xD8, 0xFF, 0x01).map(_.toByte)) // SOI, TEM
    bb4.put(Array(0xFF, 0xC0, 0x00, 0x0B, 0x08).map(_.toByte))
    bb4.putShort(7.toShort).putShort(9.toShort)
    bb4.put(Array(0x01, 0x01, 0x11, 0x00).map(_.toByte))
    assert(Multimodal.jpegDims(bb4.array()).toSeq == Seq(9, 7))
    // EOI before any frame header → null
    assert(Multimodal.jpegDims(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)) == null)
    // non-JPEG inputs → null, never a throw
    assert(Multimodal.jpegDims("not an image".getBytes("UTF-8")) == null)
    assert(Multimodal.jpegDims(
      Multimodal.encodeGrayPng(Array.fill(16)(0), 4, 4)) == null)
    assert(Multimodal.jpegDims(Array[Byte](0xFF.toByte)) == null)
  }

  test("jpegDims never throws on arbitrary bytes and parses SOF " +
      "through arbitrary junk segments (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    // arbitrary byte blobs: any outcome but an exception is fine
    (1 to 500).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      Multimodal.jpegDims(b) // must not throw
    }
    // well-formed streams: SOI + n junk APPn/COM segments with random
    // lengths and bodies + SOF0 — dims must always come back exact
    (1 to 200).foreach { _ =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(0xFF); out.write(0xD8)
      (0 until rnd.nextInt(4)).foreach { _ =>
        val body = new Array[Byte](rnd.nextInt(20))
        rnd.nextBytes(body)
        out.write(0xFF); out.write(0xE0 + rnd.nextInt(15)) // APPn/COM area
        val len = body.length + 2
        out.write(len >> 8); out.write(len & 0xFF); out.write(body)
      }
      val (w, h) = (1 + rnd.nextInt(65535), 1 + rnd.nextInt(65535))
      out.write(0xFF); out.write(0xC0); out.write(0); out.write(11)
      out.write(8); out.write(h >> 8); out.write(h & 0xFF)
      out.write(w >> 8); out.write(w & 0xFF)
      out.write(1); out.write(0x11); out.write(0); out.write(0)
      assert(Multimodal.jpegDims(out.toByteArray).toSeq == Seq(w, h))
    }
  }

  test("encode→decode→dHash pipeline matches direct dHash (UDF path)") {
    val w = 36; val h = 28
    val df = spark.range(6).select(col("id"),
      org.apache.spark.sql.functions.transform(
        sequence(lit(0), lit(w * h - 1)),
        i => ((i * 13 + col("id") * 31 + (i % 17) * 9) % 256).cast("int"))
        .as("px"))
    val viaPng = df.select(col("id"), Multimodal.dHash56Udf(
      Multimodal.pngDecodeGrayUdf(
        Multimodal.pngEncodeGrayUdf(col("px"), lit(w), lit(h))),
      lit(w), lit(h)).as("hash"))
    val direct = df.select(col("id"),
      Multimodal.dHash56Udf(col("px"), lit(w), lit(h)).as("hash"))
    assert(viaPng.collect().toSeq.sortBy(_.getLong(0)) ==
      direct.collect().toSeq.sortBy(_.getLong(0)))
  }
}
