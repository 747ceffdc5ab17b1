package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines — a declared extension beyond the reference, which
  * ships media as opaque URLs/ids only.
  *
  * Design: media travels as an opaque `binary` column plus a typed
  * metadata struct the engine derives (byte length, content digest,
  * container format from magic bytes). All Spark-side plumbing —
  * schemas, partitioning, per-partition batch shape — is real and
  * tested. The codec boundary is REAL for lossless formats: 8-bit
  * grayscale PNG encode/decode (javax.imageio) and 16-bit PCM WAV
  * encode/decode (pure byte math) round-trip actual files; only
  * LOSSY codecs (JPEG/MP3-class — absent from this container)
  * remain stubbed with a deterministic byte-level fake, clearly
  * marked below. Swapping a stub for a real codec changes no plan
  * shape: every kernel is a per-row/per-partition map with no
  * shuffle, which is exactly how a decode stage must behave at
  * 100 TB (decode cost scales out with partitions; nothing ever
  * collects).
  */
object Multimodal {

  /** Magic-byte container sniffing — real logic, engine-independent. */
  def mediaFormat(bin: Column): Column = {
    def magic(bytes: Int*): Column =
      lit(bytes.map(_.toByte).toArray)
    when(substring(bin, 1, 3) === magic(0xFF, 0xD8, 0xFF), "jpeg")
      .when(substring(bin, 1, 4) === magic(0x89, 0x50, 0x4E, 0x47), "png")
      .when(substring(bin, 1, 4) === magic(0x52, 0x49, 0x46, 0x46), "wav")
      .when(substring(bin, 5, 4) === magic(0x66, 0x74, 0x79, 0x70), "mp4")
      .otherwise("unknown")
  }

  /** Typed metadata struct: size, digest, container. */
  def mediaMetadata(bin: Column): Column =
    struct(
      length(bin).as("n_bytes"),
      sha2(bin, 256).as("sha256"),
      mediaFormat(bin).as("fmt"))

  /** ---- DECODE STUB ----
    * Deterministic fake "decode + feature extract": a normalized
    * `bins`-bucket byte histogram as the stand-in embedding. A real
    * implementation decodes pixels/samples here (e.g. via javax
    * ImageIO / a JNI codec) and emits model features; the signature,
    * null handling, and per-row batch shape are what production code
    * keeps.
    */
  def byteHistogramStub(bins: Int, roundTo: Int = 4): Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty) Array.fill(bins)(0d)
      else {
        val counts = new Array[Long](bins)
        bytes.foreach(b => counts((b & 0xFF) % bins) += 1)
        // HALF_UP, not rint (half-even): ratios like 4/128 = 0.03125
        // land exactly on the rounding boundary, and SQL engines
        // round half away from zero
        counts.map(c => BigDecimal(c.toDouble / bytes.length)
          .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    c => f(c)
  }

  // ---- REAL header parsing (no codec required) ----
  // Container headers are plain byte arithmetic: these parsers work
  // on genuine files (MultimodalSpec pins golden real-file bytes),
  // shrinking the stub boundary to pixel/sample DECODE only.

  /** Unsigned byte at 1-based `pos`, as a long expression. */
  private def u8(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast("long")

  /** Big-endian u32 at 1-based `pos` (PNG integers). */
  private def beU32(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 4)), 16, 10).cast("long")

  /** Little-endian u32 / u16 at 1-based `pos` (RIFF integers). */
  private def leU32(bin: Column, pos: Int): Column =
    u8(bin, pos) + u8(bin, pos + 1) * 256L +
      u8(bin, pos + 2) * 65536L + u8(bin, pos + 3) * 16777216L
  private def leU16(bin: Column, pos: Int): Column =
    u8(bin, pos) + u8(bin, pos + 1) * 256L

  /** PNG dimensions from the IHDR chunk (spec: 8-byte signature,
    * 4-byte length, "IHDR", then width/height as big-endian u32 at
    * byte offsets 17/21 1-based). Null for non-PNG bytes. REAL —
    * reads any on-spec PNG without decoding a single pixel.
    */
  def pngDims(bin: Column): Column =
    when(mediaFormat(bin) === "png" &&
        substring(bin, 13, 4) === lit("IHDR".getBytes("US-ASCII")),
      struct(beU32(bin, 17).as("width"), beU32(bin, 21).as("height")))

  /** WAV stream parameters from the canonical 44-byte RIFF/fmt/data
    * header: channels (LE u16 @23), sample rate (LE u32 @25), bits
    * per sample (LE u16 @35), and duration in milliseconds derived
    * from the data-chunk size (LE u32 @41) over the byte rate
    * (LE u32 @29). Null for non-WAV bytes. REAL for canonically-laid
    * PCM files (extensible headers with extra chunks need a chunk
    * walk — a per-row kernel, same shape).
    */
  def wavInfo(bin: Column): Column =
    when(mediaFormat(bin) === "wav" &&
        substring(bin, 9, 4) === lit("WAVE".getBytes("US-ASCII")),
      struct(
        leU16(bin, 23).as("channels"),
        leU32(bin, 25).as("sample_rate"),
        leU16(bin, 35).as("bits"),
        floor(lit(1000.0) * leU32(bin, 41) / leU32(bin, 29))
          .cast("long").as("duration_ms")))

  /** Deterministic on-spec header builders — the encode twins of the
    * parsers (and the test-data synthesizers for q143): real byte
    * layouts, zero-CRC PNG (parsers don't verify CRCs) and a
    * zero-data-payload WAV.
    */
  def pngHeaderUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (w: Long, h: Long) =>
      val bb = java.nio.ByteBuffer.allocate(33)
      bb.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
      bb.putInt(w.toInt).putInt(h.toInt)
      bb.put(8: Byte).put(6: Byte).put(0: Byte).put(0: Byte).put(0: Byte)
      bb.putInt(0) // CRC not validated by header readers
      bb.array()
    }

  def wavHeaderUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (channels: Long, sampleRate: Long, dataBytes: Long) =>
      val bits = 16
      val byteRate = sampleRate * channels * bits / 8
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes.toInt)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1: Short).putShort(channels.toShort)
      bb.putInt(sampleRate.toInt).putInt(byteRate.toInt)
      bb.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      bb.put("data".getBytes("US-ASCII")).putInt(dataBytes.toInt)
      bb.array()
    }

  // ---- REAL pixel codec (JDK javax.imageio — no external libs) ----
  // The decode boundary q143 left stubbed is closed for 8-bit
  // grayscale PNG: encode writes a genuine zlib-compressed PNG
  // (real IDAT, real CRCs — any reader opens it), decode reads
  // pixels back through the JDK's PNG plugin. Lossless round-trip
  // (8-bit gray has no chroma subsampling), pinned by
  // MultimodalSpec. The lossy twin ([[encodeGrayJpeg]]) closes the
  // JPEG half below; remaining stub: compressed audio only.

  /** Row-major gray pixels (0-255) → real PNG bytes. */
  private[graft] def encodeGrayPng(pixels: Array[Int], w: Int,
      h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var i = 0
    while (i < w * h) { r.setSample(i % w, i / w, 0, pixels(i)); i += 1 }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Real PNG decode → row-major gray pixels; null for undecodable. */
  private[graft] def decodeGrayPng(png: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    if (img == null) null
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val r = img.getRaster
      val out = new Array[Int](w * h)
      var i = 0
      while (i < w * h) { out(i) = r.getSample(i % w, i / w, 0); i += 1 }
      out
    }
  }

  /** 56-bit perceptual difference hash (dHash) of a gray image:
    * integer area-average onto a 9-wide × 7-tall grid (w, h must
    * divide evenly — the decode stage resizes to a canonical size
    * first), then one bit per horizontally-adjacent mean pair,
    * bit (row*8+col) set iff mean(col+1) > mean(col). 56 bits keeps
    * the hash a positive BIGINT on every SQL engine (the
    * [[graft.expressions.SimHash60]] convention), and integer-only
    * arithmetic makes it exactly replayable: near-duplicate images
    * differ in a few bits, so the SimHash multi-table bucketing
    * ([[graft.dedup.Dedup.bandedHammingPairs]]) applies unchanged.
    */
  /** REAL integer area-average downscale for exactly-divisible
    * dims: target pixel = floor(mean) of its source cell — the
    * resize [[dHash56]] uses internally, exposed as the pipeline
    * resize stage for gray pixel arrays (the [[resizeStub]]
    * byte-truncation fake remains only for opaque payloads where no
    * decode exists; a fractional-scale resampler belongs with the
    * lossy codecs).
    */
  private[graft] def resizeGrayArea(pixels: Array[Int], w: Int, h: Int,
      tw: Int, th: Int): Array[Int] = {
    require(w % tw == 0 && h % th == 0,
      s"area resize needs divisible dims, got ${w}x$h -> ${tw}x$th")
    val (cw, ch) = (w / tw, h / th)
    val out = new Array[Int](tw * th)
    var by = 0
    while (by < th) {
      var bx = 0
      while (bx < tw) {
        var s = 0; var y = by * ch
        while (y < (by + 1) * ch) {
          var x = bx * cw
          while (x < (bx + 1) * cw) { s += pixels(y * w + x); x += 1 }
          y += 1
        }
        out(by * tw + bx) = s / (cw * ch)
        bx += 1
      }
      by += 1
    }
    out
  }

  /** UDF form of [[resizeGrayArea]]. */
  def resizeGrayUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (pixels: Seq[Int], w: Int, h: Int, tw: Int, th: Int) =>
      resizeGrayArea(pixels.toArray, w, h, tw, th).toSeq
    }

  private[graft] def dHash56(pixels: Array[Int], w: Int, h: Int): Long = {
    val (gc, gr) = (9, 7)
    require(w % gc == 0 && h % gr == 0,
      s"dHash56 needs dims divisible by ${gc}x$gr, got ${w}x$h")
    val means = resizeGrayArea(pixels, w, h, gc, gr)
    var hash = 0L; var r2 = 0
    while (r2 < gr) {
      var c = 0
      while (c < gc - 1) {
        if (means(r2 * gc + c + 1) > means(r2 * gc + c))
          hash |= 1L << (r2 * 8 + c)
        c += 1
      }
      r2 += 1
    }
    hash
  }

  /** UDF: pixel array column + dims → real PNG binary. */
  def pngEncodeGrayUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (pixels: Seq[Int], w: Int, h: Int) =>
      encodeGrayPng(pixels.toArray, w, h)
    }

  /** UDF: PNG binary → row-major gray pixel array (real decode). */
  def pngDecodeGrayUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (png: Array[Byte]) =>
      val p = decodeGrayPng(png)
      if (p == null) null else p.toSeq
    }

  /** UDF: decoded pixels + dims → 56-bit perceptual hash. */
  def dHash56Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (pixels: Seq[Int], w: Int, h: Int) =>
      dHash56(pixels.toArray, w, h)
    }

  /** ViT-style patch grid: a decoded gray image split into
    * (w/pw)×(h/ph) non-overlapping patches with exact-integer
    * per-patch stats — the patch-embedding input layout a vision
    * training pipeline materializes before the model ever sees a
    * pixel. Rows: (patch_row, patch_col, sum, min, max).
    */
  private[graft] def patchStats(pixels: Array[Int], w: Int, h: Int,
      pw: Int, ph: Int): Seq[(Int, Int, Long, Int, Int)] = {
    require(w % pw == 0 && h % ph == 0,
      s"patch grid needs dims divisible by ${pw}x$ph, got ${w}x$h")
    for (pr <- 0 until h / ph; pc <- 0 until w / pw) yield {
      var s = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var y = pr * ph
      while (y < (pr + 1) * ph) {
        var x = pc * pw
        while (x < (pc + 1) * pw) {
          val p = pixels(y * w + x)
          s += p; if (p < mn) mn = p; if (p > mx) mx = p
          x += 1
        }
        y += 1
      }
      (pr, pc, s, mn, mx)
    }
  }

  /** UDF: decoded pixels + dims + patch dims → patch-stat rows. */
  def patchStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (pixels: Seq[Int], w: Int, h: Int, pw: Int, ph: Int) =>
      patchStats(pixels.toArray, w, h, pw, ph)
    }

  /** Framed audio features — the ASR preprocessing layout (the
    * audio twin of [[patchStats]]): decoded PCM split into
    * `frameLen`-sample windows at `hop` stride (overlapping when
    * hop < frameLen, FULL frames only), each frame reduced to
    * exact integers: energy = Σx², zero crossings (sign change
    * between consecutive samples, x ≥ 0 counted positive), peak
    * |x|. Rows: (frame, energy, zcr, peak).
    */
  private[graft] def audioFrames(samples: Array[Int], frameLen: Int,
      hop: Int): Seq[(Int, Long, Int, Int)] = {
    require(frameLen > 0 && hop > 0, "frameLen and hop must be > 0")
    val out = Seq.newBuilder[(Int, Long, Int, Int)]
    var f = 0
    while (f * hop + frameLen <= samples.length) {
      var e = 0L; var z = 0; var pk = 0
      var i = f * hop
      val end = f * hop + frameLen
      while (i < end) {
        val v = samples(i)
        e += v.toLong * v
        if (i > f * hop &&
          ((v >= 0) != (samples(i - 1) >= 0))) z += 1
        val a = math.abs(v); if (a > pk) pk = a
        i += 1
      }
      out += ((f, e, z, pk))
      f += 1
    }
    out.result()
  }

  /** UDF: decoded samples + frame/hop → framed feature rows. */
  def audioFramesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (samples: Seq[Int], frameLen: Int, hop: Int) =>
      audioFrames(samples.toArray, frameLen, hop)
    }

  // ---- REAL lossy pixel codec (JDK javax.imageio JPEG plugin) ----
  // The last documented pixel-codec stub closes here: encode writes a
  // genuine baseline JFIF JPEG (real DCT, real Huffman tables — any
  // reader opens it) at an explicit quality factor, decode reads the
  // pixels back through the JDK's JPEG plugin. Lossy: the round-trip
  // is NOT bit-exact, so oracle queries verify the structural facts
  // (dims parsed from the real bytes, pixel count, bounded
  // reconstruction error) and MultimodalSpec pins the error bands and
  // dHash stability. Remaining stubs: compressed audio (MP3-class)
  // only — the JDK ships no decoder for those and the sandbox has no
  // external libs, documented at [[resizeStub]].

  /** Row-major gray pixels (0-255) → real baseline JPEG bytes at the
    * given quality (0..1).
    */
  private[graft] def encodeGrayJpeg(pixels: Array[Int], w: Int, h: Int,
      quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var i = 0
    while (i < w * h) { r.setSample(i % w, i / w, 0, pixels(i)); i += 1 }
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Real JPEG decode → row-major gray pixels; null for undecodable.
    * `ImageIO.read` sniffs the container, so this shares
    * [[decodeGrayPng]]'s reader path with the JPEG plugin selected.
    */
  private[graft] def decodeGrayJpeg(jpeg: Array[Byte]): Array[Int] =
    decodeGrayPng(jpeg)

  /** (width, height) parsed from real JPEG bytes by pure byte math —
    * no ImageIO. Walks the marker stream from SOI: each segment is
    * 0xFF marker + big-endian u16 length (length includes itself);
    * the frame headers SOF0–SOF15 (minus DHT 0xC4 / JPG 0xC8 / DAC
    * 0xCC, which reuse the range) carry precision u8, height u16,
    * width u16. Returns null for non-JPEG input. The JFIF twin of
    * [[pngDims]]/[[wavInfo]], exercised in q152 against the real
    * encoder's output.
    */
  private[graft] def jpegDims(bytes: Array[Byte]): Array[Int] = {
    def u8At(i: Int): Int = bytes(i) & 0xFF
    if (bytes.length < 4 || u8At(0) != 0xFF || u8At(1) != 0xD8) return null
    var p = 2
    while (p + 1 < bytes.length) {
      if (u8At(p) != 0xFF) return null
      // ITU T.81 B.1.1.2: markers may be preceded by any number of
      // 0xFF fill bytes — skip the run, then read the marker code
      while (p + 1 < bytes.length && u8At(p + 1) == 0xFF) p += 1
      if (p + 1 >= bytes.length) return null
      val m = u8At(p + 1)
      if (m == 0xD9) return null // EOI before any frame header
      else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        p += 2 // standalone: SOI, TEM, RSTn carry no length
      } else {
        if (p + 3 >= bytes.length) return null
        val len = (u8At(p + 2) << 8) | u8At(p + 3)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (p + 8 >= bytes.length) return null
          val h = (u8At(p + 5) << 8) | u8At(p + 6)
          val w = (u8At(p + 7) << 8) | u8At(p + 8)
          return Array(w, h)
        }
        p += 2 + len
      }
    }
    null
  }

  /** UDF: pixels + dims + quality → real JPEG bytes. */
  def jpegEncodeGrayUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (pixels: Seq[Int], w: Int, h: Int, q: Double) =>
      encodeGrayJpeg(pixels.toArray, w, h, q.toFloat)
    }

  /** UDF: JPEG binary → row-major gray pixel array. Same reader as
    * [[pngDecodeGrayUdf]] — `ImageIO.read` sniffs the container — so
    * this is an alias, kept named for call-site clarity.
    */
  def jpegDecodeGrayUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    pngDecodeGrayUdf

  /** UDF: JPEG binary → struct(width, height) via [[jpegDims]]. */
  def jpegDimsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (jpeg: Array[Byte]) =>
      val d = jpegDims(jpeg)
      if (d == null) null else (d(0), d(1))
    }

  // ---- REAL PCM sample codec (pure byte math — no library at all) ----
  // The audio half of the stub boundary closes the same way the PNG
  // half did: canonical 16-bit little-endian PCM is arithmetic, not
  // a codec. encode writes header+payload bytes, decode reads signed
  // samples back; lossless by construction. Remaining stub: lossy
  // codecs (JPEG/MP3-class) only.

  /** Signed 16-bit samples → canonical 44-byte-header mono WAV. */
  private[graft] def encodePcm16(samples: Array[Int], sampleRate: Int)
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1: Short).putShort(1: Short)
    bb.putInt(sampleRate).putInt(sampleRate * 2)
    bb.putShort(2: Short).putShort(16: Short)
    bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** Real 16-bit LE PCM decode from a canonically-laid mono WAV
    * (the [[wavInfo]] layout); null for non-WAV bytes.
    */
  private[graft] def decodePcm16(wav: Array[Byte]): Array[Int] = {
    if (wav == null || wav.length < 44 ||
      wav(0) != 'R' || wav(1) != 'I' || wav(2) != 'F' || wav(3) != 'F' ||
      wav(8) != 'W' || wav(9) != 'A' || wav(10) != 'V' || wav(11) != 'E')
      null
    else {
      val bb = java.nio.ByteBuffer.wrap(wav)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataBytes = math.min(bb.getInt(40),
        wav.length - 44) // header field vs actual payload
      val n = dataBytes / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = bb.getShort(44 + 2 * i).toInt; i += 1 }
      out
    }
  }

  def pcmEncodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (samples: Seq[Int], sampleRate: Int) =>
      encodePcm16(samples.toArray, sampleRate)
    }

  def pcmDecodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (wav: Array[Byte]) =>
      val s = decodePcm16(wav)
      if (s == null) null else s.toSeq
    }

  /** Exact-integer audio features over a decoded sample array —
    * the scan-stage statistics an audio curation pass filters on
    * (silence/clipping/noise screens), all integer arithmetic so
    * any engine replays them: mean-square energy (floored),
    * zero-crossing count (sign changes, zeros skipped), peak |s|.
    */
  def audioFeatures(samples: Column): Column = {
    val n = size(samples)
    val energy = floor(
      aggregate(samples, lit(0L), (a, s) => a + s.cast("long") * s) /
        greatest(n, lit(1)).cast("double")).cast("long")
    // count sign CHANGES between consecutive nonzero samples
    val signs = filter(transform(samples,
      s => when(s > 0, 1).when(s < 0, -1).otherwise(0)), s => s =!= 0)
    val zcr = when(size(signs) > 1,
      aggregate(zip_with(slice(signs, lit(1), size(signs) - 1),
        slice(signs, lit(2), size(signs) - 1), (a, b) =>
          when(a =!= b, 1L).otherwise(0L)), lit(0L), _ + _))
      .otherwise(lit(0L))
    val peak = coalesce(array_max(transform(samples, s => abs(s))),
      lit(0))
    struct(n.cast("long").as("n_samples"), energy.as("energy_fx"),
      zcr.as("zcr"), peak.cast("long").as("peak"))
  }

  // ---- REAL frame container walk ----
  // A "video" here is a stream of concatenated on-spec PNGs (an
  // MJPEG-style layout with a lossless codec). Splitting it is REAL
  // container parsing — each frame's extent is found by walking its
  // chunk list ([len u32 BE][type][data][crc] … until IEND), exactly
  // how any PNG stream consumer finds frame boundaries. Replaces
  // [[frameSampleStub]]'s strided fake for PNG streams; with the
  // per-frame [[decodeGrayPng]] + [[dHash56]] the whole
  // video → frames → pixels → perceptual-hash path is codec-real.

  /** Split a concatenated-PNG stream into frames; ignores a
    * trailing partial frame; empty for non-PNG bytes.
    */
  private[graft] def splitPngs(bin: Array[Byte]): Array[Array[Byte]] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 0
    def sigAt(q: Int): Boolean =
      q + 8 <= bin.length && (0 until 8).forall(i => bin(q + i) == sig(i))
    def beU32At(q: Int): Long =
      ((bin(q) & 0xFFL) << 24) | ((bin(q + 1) & 0xFFL) << 16) |
        ((bin(q + 2) & 0xFFL) << 8) | (bin(q + 3) & 0xFFL)
    while (sigAt(p)) {
      var q = p + 8
      var end = -1
      while (end < 0 && q + 8 <= bin.length) {
        val len = beU32At(q)
        val isEnd = bin(q + 4) == 'I' && bin(q + 5) == 'E' &&
          bin(q + 6) == 'N' && bin(q + 7) == 'D'
        val next = q + 8L + len + 4L
        if (next > bin.length) q = bin.length // truncated chunk
        else {
          q = next.toInt
          if (isEnd) end = q
        }
      }
      if (end < 0) return out.toArray // drop the partial tail
      out += java.util.Arrays.copyOfRange(bin, p, end)
      p = end
    }
    out.toArray
  }

  /** UDF: concatenated-PNG stream → array of frame binaries. */
  def pngFramesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bin: Array[Byte]) =>
      if (bin == null) Seq.empty[Array[Byte]] else splitPngs(bin).toSeq
    }

  /** ---- RESIZE STUB ----
    * Deterministic fake "resize": truncate-or-zero-pad the payload
    * to `targetBytes`. A real implementation rescales pixels; the
    * fixed-output-size contract is what matters to the pipeline.
    */
  def resizeStub(targetBytes: Int): Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Array.fill(targetBytes)(0: Byte)
      else java.util.Arrays.copyOf(bytes, targetBytes)
    }
    c => f(c)
  }

  /** ---- FRAME-SAMPLE STUB ----
    * "Video" frame sampling as strided fixed-size byte slices —
    * expression-only (no UDF): real frame extraction swaps the slice
    * for a container-aware read, keeping the array<binary> shape.
    */
  def frameSampleStub(bin: Column, stride: Int, frameSize: Int,
      maxFrames: Int): Column =
    filter(
      transform(sequence(lit(0), lit(maxFrames - 1)),
        i => bin.substr(i * stride + lit(1), lit(frameSize))),
      fr => length(fr) === frameSize)

  /** Batch feature-extraction pipeline over a media table:
    * metadata + stub embedding in one narrow map-side pass.
    */
  def extractFeatures(media: DataFrame, idCol: String, binCol: String,
      bins: Int = 16): DataFrame =
    media.select(
      col(idCol),
      mediaMetadata(col(binCol)).as("meta"),
      byteHistogramStub(bins)(col(binCol)).as("embedding"))

  case class MediaMeta(n_bytes: Option[Int], sha256: Option[String],
    fmt: String)

  /** Batched (per-partition) form of [[extractFeatures]] — the JVM
    * analog of the `mapInPandas` batch contract: initialization (a
    * real pipeline constructs its codec / feature model here) happens
    * once per PARTITION, rows stream through as an iterator, memory
    * stays bounded to one row batch, and nothing shuffles. Output is
    * row-for-row identical to the per-row expression form
    * (MultimodalSpec pins it, including null-binary and magic-byte
    * edge cases). This is the shape a 100 TB decode stage keeps:
    * decode cost scales out with partitions, codec startup amortizes
    * over a partition, and swapping the stub for a real codec
    * changes no plan.
    */
  def extractFeaturesBatched(media: DataFrame, idCol: String,
      binCol: String, bins: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ---- per-partition init (the codec boundary) ----
        val sha = java.security.MessageDigest.getInstance("SHA-256")
        def is(b: Array[Byte], off: Int, bytes: Int*): Boolean =
          b.length >= off + bytes.length &&
            bytes.zipWithIndex.forall { case (x, i) => b(off + i) == x.toByte }
        def fmtOf(b: Array[Byte]): String =
          if (b == null) "unknown"
          else if (is(b, 0, 0xFF, 0xD8, 0xFF)) "jpeg"
          else if (is(b, 0, 0x89, 0x50, 0x4E, 0x47)) "png"
          else if (is(b, 0, 0x52, 0x49, 0x46, 0x46)) "wav"
          else if (is(b, 4, 0x66, 0x74, 0x79, 0x70)) "mp4"
          else "unknown"
        it.map { case (id, bytes) =>
          val meta =
            if (bytes == null) MediaMeta(None, None, "unknown")
            else {
              sha.reset()
              MediaMeta(Some(bytes.length),
                Some(sha.digest(bytes).map(b => f"$b%02x").mkString),
                fmtOf(bytes))
            }
          val hist =
            if (bytes == null || bytes.isEmpty) Seq.fill(bins)(0d)
            else {
              val counts = new Array[Long](bins)
              bytes.foreach(b => counts((b & 0xFF) % bins) += 1)
              counts.toSeq.map(c => BigDecimal(c.toDouble / bytes.length)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          (id, meta, hist)
        }
      }
      .toDF(idCol, "meta", "embedding")
  }
}
