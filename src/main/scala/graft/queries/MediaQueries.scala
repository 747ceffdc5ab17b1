package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.io.Tables.table
import graft.multimodal.{G711, ImaAdpcm, Multimodal}

/** Multimodal surface: binary media columns built deterministically
  * from the documents table (magic prefix by doc_id % 4 + utf8 text
  * payload), then metadata extraction and the stub feature kernel.
  * The binary plumbing (construction, sniffing, length) is oracle-
  * verified; the decode boundary itself is the documented stub.
  */
object MediaQueries extends QueryPack {

  private def magicLit(bytes: Int*): Column = lit(bytes.map(_.toByte).toArray)

  /** doc_id%4: 0→jpeg, 1→png, 2→wav, 3→bare text (unknown). */
  private def mediaBin: Column = {
    val payload = col("text").cast("binary")
    when(col("doc_id") % 4 === 0,
      concat(magicLit(0xFF, 0xD8, 0xFF), payload))
      .when(col("doc_id") % 4 === 1,
        concat(magicLit(0x89, 0x50, 0x4E, 0x47), payload))
      .when(col("doc_id") % 4 === 2,
        concat(magicLit(0x52, 0x49, 0x46, 0x46), payload))
      .otherwise(payload)
  }

  /** Shared waveform round-trip report for the audio-codec family
    * (q155/q157/q160): one deterministic generator (quadratic chirp
    * parameterized by the codec's sample width) and one
    * error-fold/digest presentation, so a generator tweak can never
    * desynchronize one codec query from its oracle twin while the
    * others move. `decodeEncoded` is the codec round trip.
    */
  private def codecRoundTrip(s: SparkSession, dir: String,
      i2Mul: Int, docMul: Int, iMul: Int, mod: Int,
      decodeEncoded: Column => Column): DataFrame = {
    val n = col("doc_id") % 200 + 50
    val samples = transform(sequence(lit(0), n - 1), i =>
      (((i * i * i2Mul + col("doc_id") * docMul + i * iMul) % mod)
        - mod / 2).cast("int"))
    table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), samples.as("x"))
      .select(col("doc_id"), col("x"), decodeEncoded(col("x")).as("y"))
      // build the abs-diff array ONCE (HOFs are not CSE'd) and run
      // both error folds over the column
      .withColumn("d", zip_with(col("x"), col("y"), (a, b) => abs(a - b)))
      .select(col("doc_id"),
        size(col("y")).cast("long").as("n_samples"),
        aggregate(col("d"), lit(0), (acc, e) => greatest(acc, e))
          .cast("long").as("max_abs_err"),
        aggregate(col("d"), lit(0L), (acc, e) => acc + e)
          .as("sum_abs_err"),
        md5(array_join(transform(col("y"), v => v.cast("string")), ","))
          .as("dec_md5"))
      .orderBy(col("doc_id"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata pass: size + container sniff over the binary, digest
    // over the payload.
    "q71_media_metadata" -> ((s, dir) => {
      table(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          length(mediaBin).as("n_bytes"),
          Multimodal.mediaFormat(mediaBin).as("fmt"),
          sha2(col("text").cast("binary"), 256).as("digest"))
        .orderBy(col("doc_id"))
    }),

    // Stub decode: normalized 16-bin byte histogram over the text
    // payload (ASCII ⇒ byte histogram == char histogram, which is
    // how the oracle reproduces it). Exploded to (doc_id, bin, share)
    // scalar rows — the driver's comparator sorts on every column and
    // cannot hash a raw array value.
    "q72_media_features" -> ((s, dir) => {
      table(s, dir, "documents")
        // The empty-text guard mirrors the oracle's implicit exclusion:
        // a doc with no characters drops out of its `n` CTE, while the
        // histogram stub would emit 16 zero-share rows for it.
        .filter(col("doc_id") < 100 && length(col("text")) > 0)
        .select(col("doc_id"),
          posexplode(Multimodal.byteHistogramStub(bins = 16)(
            col("text").cast("binary"))))
        .select(col("doc_id"), col("pos").cast("int").as("bin"),
          col("col").as("share"))
        .orderBy(col("doc_id"), col("bin"))
    }),

    // REAL header parsing round-trip: on-spec PNG/WAV headers built
    // from doc_id formulas (the encode twins), parsed back by the
    // pure-byte-math parsers (pngDims / wavInfo — these read genuine
    // files; MultimodalSpec pins golden real-file bytes). The oracle
    // computes the formulas directly, so a builder OR parser bug
    // breaks the match. Shrinks the stub boundary to pixel/sample
    // decode only.
    "q143_media_headers" -> ((s, dir) => {
      val w = col("doc_id") % 512 + 16
      val h = col("doc_id") % 384 + 16
      val ch = col("doc_id") % 2 + 1
      val sr = lit(8000L) + (col("doc_id") % 5) * 1000L
      val db = (col("doc_id") % 1000 + 1) * 64L
      table(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.pngDims(Multimodal.pngHeaderUdf(w, h)).as("png"),
          Multimodal.wavInfo(Multimodal.wavHeaderUdf(ch, sr, db)).as("wav"))
        .select(col("doc_id"),
          col("png.width").as("width"), col("png.height").as("height"),
          col("wav.channels").as("channels"),
          col("wav.sample_rate").as("sample_rate"),
          col("wav.duration_ms").as("duration_ms"))
        .orderBy(col("doc_id"))
    }),

    // REAL pixel decode: deterministic 36x28 gray images (pixel
    // formula below), encoded as genuine zlib-compressed PNGs
    // (javax.imageio), decoded BACK through the real PNG reader,
    // then 56-bit perceptual dHash over integer 4x4 block means.
    // Groups of 5 docs share a base image; variants v=1..4 flip
    // ~10 sparse pixels, so in-group hashes differ by a few bits.
    // The oracle replays the formula + block means + bits in SQL —
    // a bug in the encoder, the decoder, OR the hash breaks the
    // match. Closes the q143 stub boundary for lossless images.
    "q144_image_phash" -> ((s, dir) => {
      table(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), phashExpr.as("phash"))
        .orderBy(col("doc_id"))
    }),

    // ViT-style patch-grid extraction (Multimodal.patchStats): the
    // q144 images decoded through the REAL PNG reader, split into
    // 4x4 patches with exact-integer per-patch stats — the patch-
    // embedding input layout a vision pipeline materializes. The
    // oracle replays pixel formula → patch sums with no codec, so
    // an encoder, decoder, OR patch-walk bug breaks the match.
    "q223_image_patches" -> ((s, dir) => {
      table(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(Multimodal.patchStatsUdf(
            Multimodal.pngDecodeGrayUdf(
              Multimodal.pngEncodeGrayUdf(pixelsExpr, lit(imgW),
                lit(imgH))),
            lit(imgW), lit(imgH), lit(4), lit(4))).as("p"))
        .select(col("doc_id"), col("p._1").as("patch_row"),
          col("p._2").as("patch_col"), col("p._3").as("p_sum"),
          col("p._4").cast("long").as("p_min"),
          col("p._5").cast("long").as("p_max"))
        .orderBy(col("doc_id"), col("patch_row"), col("patch_col"))
    }),

    // Perceptual near-dup pairs: 4 x 14-bit band bucketing over the
    // 56-bit dHash (Dedup.bandedHammingPairs) at maxHamming=3 —
    // recall is TOTAL for distance < tables (pigeonhole), so the
    // bucketed plan must equal the oracle's all-pairs scan exactly.
    // At scale the band equi-join shuffles (band, 8-byte hash, id)
    // rows; the 19900-pair cross product never materializes.
    "q145_image_phash_pairs" -> ((s, dir) => {
      val hashes = table(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), phashExpr.as("phash"))
      Dedup.bandedHammingPairs(hashes, "doc_id", "phash",
        totalBits = 56, width = 14, tables = 4, maxHamming = 3)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // REAL audio sample decode: deterministic 16-bit PCM waveforms
    // (formula below) are encoded into genuine mono WAVs, decoded
    // BACK by the pure-byte-math PCM reader, then screened with the
    // exact-integer audio features a curation pass filters on
    // (energy / zero-crossings / peak). decode(encode(x)) == x for
    // PCM, so the oracle replays formula → features with no codec —
    // an encoder, decoder, OR feature bug breaks the match. With
    // q144 this closes the lossless half of the media stub boundary.
    "q147_audio_features" -> ((s, dir) => {
      val n = col("doc_id") % 200 + 50
      val sr = (lit(8000) + (col("doc_id") % 5) * 1000).cast("int")
      val samples = transform(sequence(lit(0), n - 1), i =>
        (((i * i + col("doc_id") * 31 + i * 7) % 4096) - 2048)
          .cast("int"))
      table(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.audioFeatures(
            Multimodal.pcmDecodeUdf(
              Multimodal.pcmEncodeUdf(samples, sr))).as("af"))
        .select(col("doc_id"),
          col("af.n_samples").as("n_samples"),
          col("af.energy_fx").as("energy_fx"),
          col("af.zcr").as("zcr"),
          col("af.peak").as("peak"))
        .orderBy(col("doc_id"))
    }),

    // Framed audio features (Multimodal.audioFrames): the q147 PCM
    // round-trip reframed into overlapping 64-sample windows at
    // hop 32 — the ASR preprocessing layout, the audio twin of the
    // q223 patch grid. Per frame: exact-integer energy / zero
    // crossings / peak. decode(encode(x)) == x for PCM, so the
    // oracle replays formula → frames with no codec.
    "q224_audio_frames" -> ((s, dir) => {
      val n = col("doc_id") % 200 + 50
      val sr = (lit(8000) + (col("doc_id") % 5) * 1000).cast("int")
      val samples = transform(sequence(lit(0), n - 1), i =>
        (((i * i + col("doc_id") * 31 + i * 7) % 4096) - 2048)
          .cast("int"))
      table(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          explode(Multimodal.audioFramesUdf(
            Multimodal.pcmDecodeUdf(
              Multimodal.pcmEncodeUdf(samples, sr)),
            lit(64), lit(32))).as("fr"))
        .select(col("doc_id"), col("fr._1").as("frame"),
          col("fr._2").as("energy"),
          col("fr._3").cast("long").as("zcr"),
          col("fr._4").cast("long").as("peak"))
        .orderBy(col("doc_id"), col("frame"))
    }),

    // REAL video-frame extraction: per-doc "videos" are streams of
    // 2-4 concatenated genuine PNGs (frame pixels from the formula
    // below). The TESTED path is all real: the container walk finds
    // each frame's extent by chunk-length parsing to IEND
    // (Multimodal.splitPngs), frames decode through the real PNG
    // reader, and each hashes to its 56-bit dHash. The oracle
    // replays formula → block means → bits per (doc, frame), so the
    // stream builder, the walk, the decoder, and the hash are all
    // under test. Replaces the frame-sample stub for PNG streams.
    "q148_video_frames" -> ((s, dir) => {
      videoFrameHashes(s, dir).orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Aligned-frame video near-dup: candidate pairs must share a
    // (frame_idx, 14-bit hash band) bucket — 4 tables make recall
    // TOTAL at hamming<=3 (pigeonhole, the q145 contract), so the
    // bucketed plan must equal the oracle's all-pairs frame join.
    // Videos pair when >= 2 aligned frames match. At scale the band
    // equi-join shuffles (idx, band, hash, id) rows only; no frame
    // pixel ever shuffles.
    "q149_video_neardup" -> ((s, dir) => {
      val fh = videoFrameHashes(s, dir)
      val bands = (0 until 4).map { t =>
        fh.withColumn("__b",
          shiftright(col("phash"), 42 - 14 * t)
            .bitwiseAND(lit(0x3FFFL)))
          .withColumn("__t", lit(t))
      }.reduce(_.unionByName(_))
      val a = bands.select(col("frame_idx"), col("__t"), col("__b"),
        col("doc_id").as("doc_a"), col("phash").as("ha"))
      val b = bands.select(col("frame_idx"), col("__t"), col("__b"),
        col("doc_id").as("doc_b"), col("phash").as("hb"))
      a.join(b, Seq("frame_idx", "__t", "__b"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("frame_idx"),
          col("ha"), col("hb")).distinct()
        .filter(Dedup.hammingDist(col("ha"), col("hb")) <= 3)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_frames"))
        .filter(col("n_frames") >= 2)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // REAL standardized lossy AUDIO codec: G.711 μ-law companding of
    // the q147 waveforms — 16-bit PCM → 8-bit log codes → decoded
    // back. μ-law is exact integer math, so unlike JPEG this lossy
    // round-trip carries a FULL hash oracle: DuckDB replays the
    // companding (threshold-chain exponent + shifts/masks) and every
    // decoded sample, its md5 stream digest, and the exact error
    // sums must all match. Shrinks the audio stub to perceptual
    // (MP3-class) codecs, which no JDK decoder exists for.
    "q155_g711_roundtrip" -> ((s, dir) => {
      codecRoundTrip(s, dir, 1, 31, 7, 4096,
        x => G711.ulawDecodeUdf(G711.ulawEncodeUdf(x)))
    }),

    // q155's telephony companion: ITU-T G.711 A-law (E1 regions) —
    // the same exact-integer companding contract, so the same FULL
    // per-sample hash oracle scheme. The generator spans the whole
    // 16-bit range (q155's ±2048 would leave A-law's top segments
    // untouched); G711Spec sweeps all 65536 inputs against the SQL
    // threshold-chain form and pins the ≤512 error bound.
    "q157_alaw_roundtrip" -> ((s, dir) => {
      codecRoundTrip(s, dir, 37, 131, 11, 65536,
        x => G711.alawDecodeUdf(G711.alawEncodeUdf(x)))
    }),

    // The STATEFUL member of the telephony family: IMA/DVI4 ADPCM
    // (multimodal.ImaAdpcm) — 4:1 compression with a (predictor,
    // step-index) recurrence across samples, still exact integer
    // arithmetic, so the oracle replays the whole recurrence with a
    // recursive CTE and every decoded sample + error sums + stream
    // digest hash-match. Same generator/corpus slice as q157.
    "q160_adpcm_roundtrip" -> ((s, dir) => {
      codecRoundTrip(s, dir, 37, 131, 11, 65536,
        x => ImaAdpcm.decodeUdf(ImaAdpcm.encodeUdf(x)))
    }),

    // REAL lossy codec round-trip: the q144 images encode as genuine
    // baseline JPEGs (javax.imageio, q=0.9), dims parse back from the
    // real bytes by the pure byte-math SOF walk (Multimodal.jpegDims —
    // no ImageIO on the read side), and pixels decode back through the
    // real JPEG plugin. Lossy codecs can't hash-verify pixel-exactly,
    // so the oracle pins the structural facts — parsed dims, decoded
    // pixel count, and a BOUNDED reconstruction error (measured worst
    // max-abs error is 20 at q=0.9; the 48 bound leaves 2.4x headroom
    // over encoder drift) — while MultimodalSpec pins the tight bands
    // (max<=32, mean<=8, dHash distance<=10). Closes the last pixel
    // stub: every image format the engine models now has a real codec.
    // Exact-integer 8x8 DCT round trip at quality granularity
    // (multimodal.Dct): 64 deterministic pixel blocks (integer
    // formula over (doc_id, x, y) — both engines synthesize the
    // same bytes), forward DCT -> JPEG-shape quantization at
    // quality 10/50/90 -> dequantize -> inverse -> clamp, with
    // per-quality distortion (max abs err, SSE) and code sparsity
    // (nnz) aggregates. Every step is fixed-point long arithmetic
    // off the hardcoded 2^13 basis table, so unlike q152's
    // encoder-dependent JPEG bands this is a FULL hash oracle —
    // the transform+quantizer core of lossy image coding, exact.
    "q238_dct_roundtrip" -> ((s, dir) => {
      import graft.multimodal.Dct
      val blocks = table(s, dir, "documents").filter(col("doc_id") < 64)
        .select(col("doc_id").cast("long").as("b"))
        .withColumn("px", expr(
          """transform(sequence(0L, 63L), i ->
            |  (b*37 + (i div 8)*16 + (i % 8)*7 +
            |   ((b+1)*((i div 8)+3)*((i % 8)+5)) % 31) % 256)"""
            .stripMargin))
      Seq(10, 50, 90).map { q =>
        blocks.withColumn("st", Dct.statsUdf(q)(col("px")))
          .agg(count(lit(1)).as("n_blocks"),
            max(col("st._1")).as("max_abs_err"),
            sum(col("st._2")).as("sse"),
            sum(col("st._3").cast("long")).as("nnz"))
          .select(lit(q).as("quality"), col("n_blocks"),
            col("max_abs_err"), col("sse"), col("nnz"))
      }.reduce(_ unionByName _).orderBy(col("quality"))
    }),

    // Zigzag + run-length coded-size model over the q238 blocks
    // (Dct.sizeUdf): the entropy-coding stage of JPEG with fixed-
    // width symbols (DC 4+cat, AC 8+cat, ZRL 8, EOB 4 — Huffman's
    // data-dependent table replaced so the byte count is exact and
    // replayable). Per quality: blocks, total bits, nonzero AC
    // codes, and bits-per-raw-bit e6 (raw = 512 bits/block) — the
    // compression-ratio readout that completes the q238 transform+
    // quantizer into a full size pipeline.
    "q240_dct_size" -> ((s, dir) => {
      import graft.multimodal.Dct
      val blocks = table(s, dir, "documents").filter(col("doc_id") < 64)
        .select(col("doc_id").cast("long").as("b"))
        .withColumn("px", expr(
          """transform(sequence(0L, 63L), i ->
            |  (b*37 + (i div 8)*16 + (i % 8)*7 +
            |   ((b+1)*((i div 8)+3)*((i % 8)+5)) % 31) % 256)"""
            .stripMargin))
      Seq(10, 50, 90).map { q =>
        blocks.withColumn("sz", Dct.sizeUdf(q)(col("px")))
          .agg(count(lit(1)).as("n_blocks"),
            sum(col("sz._1")).as("total_bits"),
            sum(col("sz._2").cast("long")).as("nnz_ac"))
          .select(lit(q).as("quality"), col("n_blocks"),
            col("total_bits"), col("nnz_ac"),
            expr("total_bits * 1000000 div (n_blocks * 512)")
              .as("ratio_e6"))
      }.reduce(_ unionByName _).orderBy(col("quality"))
    }),

    "q152_jpeg_roundtrip" -> ((s, dir) => {
      table(s, dir, "documents").filter(col("doc_id") < 200)
        // synthesize the 1008-cell pixel array ONCE per row (HOF
        // transforms are not CSE'd), then encode from the column
        .select(col("doc_id"), pixelsExpr.as("orig"))
        .select(col("doc_id"),
          Multimodal.jpegEncodeGrayUdf(col("orig"), lit(imgW), lit(imgH),
            lit(0.9)).as("jpeg"),
          col("orig"))
        .select(col("doc_id"),
          Multimodal.jpegDimsUdf(col("jpeg")).as("dims"),
          Multimodal.jpegDecodeGrayUdf(col("jpeg")).as("px"),
          col("orig"))
        .select(col("doc_id"),
          col("dims._1").as("width"),
          col("dims._2").as("height"),
          size(col("px")).as("n_pixels"),
          (aggregate(
            zip_with(col("px"), col("orig"), (a, b) => abs(a - b)),
            lit(0), (acc, x) => greatest(acc, x)) <= 48).as("err_bounded"))
        .orderBy(col("doc_id"))
    })
  )

  /** (doc_id, frame_idx, phash) over the synthesized PNG streams —
    * the real walk→decode→hash path shared by q148/q149.
    */
  private def videoFrameHashes(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        posexplode(Multimodal.pngFramesUdf(
          mkVideoUdf(col("doc_id"), (col("doc_id") % 3 + 2).cast("int")))))
      .select(col("doc_id"), col("pos").cast("int").as("frame_idx"),
        Multimodal.dHash56Udf(Multimodal.pngDecodeGrayUdf(col("col")),
          lit(imgW), lit(imgH)).as("phash"))

  /** Fixture synthesizer: `frames` genuine PNGs back-to-back, frame
    * f's pixels from the q144 formula family with f mixed into the
    * gradients (and the sparse variant perturbation shifted by f).
    */
  private def mkVideoUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (docId: Long, frames: Int) =>
      val base = docId - docId % 5
      val v = docId % 5
      val out = new java.io.ByteArrayOutputStream()
      (0 until frames).foreach { f =>
        val px = Array.tabulate(imgW * imgH) { i =>
          val x = i % imgW; val y = i / imgW
          val g = ((x * (3 + (base + f) % 11) + y * (5 + (base + f) % 13)
            + ((x.toLong * y + base + f * 7) % 17) * 15) % 256).toInt
          if (v > 0 && (x + y * imgW + v * 13 + f) % 101 == 0)
            (g + 128) % 256
          else g
        }
        out.write(Multimodal.encodeGrayPng(px, imgW, imgH))
      }
      out.toByteArray
    }

  // Deterministic test-image formula (W=36, H=28; 9x7 grid of 4x4
  // cells): base image keyed by the doc's group of 5, plus a sparse
  // per-variant perturbation. Integer-only so DuckDB replays it
  // bit-for-bit.
  private val (imgW, imgH) = (36, 28)

  private def pixelsExpr: Column = {
    val base = col("doc_id") - col("doc_id") % 5
    val v = col("doc_id") % 5
    transform(sequence(lit(0), lit(imgW * imgH - 1)), i => {
      val x = i % imgW
      val y = floor(i / imgW).cast("int")
      // base enters the x/y GRADIENTS (not just brightness): a pure
      // offset would leave adjacent-mean differences — and thus the
      // dHash — identical across groups.
      val g = (x * (lit(3) + base % 11) + y * (lit(5) + base % 13) +
        ((x * y + base) % 17) * 15) % 256
      when(v > 0 && (x + y * imgW + v * 13) % 101 === 0,
        (g + 128) % 256).otherwise(g).cast("int")
    })
  }

  private def phashExpr: Column =
    Multimodal.dHash56Udf(
      Multimodal.pngDecodeGrayUdf(
        Multimodal.pngEncodeGrayUdf(pixelsExpr, lit(imgW), lit(imgH))),
      lit(imgW), lit(imgH))

  def oracles: Map[String, String] = Map(
    "q71_media_metadata" ->
      """SELECT doc_id,
        |  cast(octet_length(CASE doc_id % 4
        |    WHEN 0 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
        |    WHEN 1 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
        |    WHEN 2 THEN '\x52\x49\x46\x46'::BLOB || encode(text)
        |    ELSE encode(text) END) as int) AS n_bytes,
        |  CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |       WHEN 2 THEN 'wav' ELSE 'unknown' END AS fmt,
        |  sha256(text) AS digest
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q72_media_features" ->
      """WITH ch AS (
        |  SELECT doc_id, ascii(unnest(string_split(text, ''))) % 16 AS bin
        |  FROM documents WHERE doc_id < 100),
        |n AS (SELECT doc_id, count(*) AS n FROM ch GROUP BY doc_id),
        |hist AS (
        |  SELECT doc_id, bin, count(*) AS c FROM ch GROUP BY doc_id, bin),
        |grid AS (
        |  SELECT n.doc_id, cast(r.range AS int) AS bin
        |  FROM n CROSS JOIN range(0, 16) r)
        |SELECT g.doc_id, g.bin,
        |  round(coalesce(h.c, 0) * 1.0 / n.n, 4) AS share
        |FROM grid g
        |JOIN n ON g.doc_id = n.doc_id
        |LEFT JOIN hist h ON h.doc_id = g.doc_id AND h.bin = g.bin
        |ORDER BY g.doc_id, g.bin""".stripMargin,
    // full relational DCT replay: same 64-long basis and
    // quality-scaled quant VALUES the kernel multiplies (emitted by
    // Dct.basisSqlValues/quantSqlValues), same sign-guarded
    // round-half-away divisions on non-negative numerators
    "q238_dct_roundtrip" -> {
      import graft.multimodal.Dct
      val quantRows = Seq(10, 50, 90).flatMap { q =>
        for (u <- 0 until 8; v <- 0 until 8)
          yield s"($q,$u,$v,${Dct.quantStep(u, v, q)})"
      }.mkString(", ")
      s"""WITH m(u, x, c) AS (VALUES ${Dct.basisSqlValues}),
         |qt(quality, u, v, q) AS (VALUES $quantRows),
         |b AS (SELECT CAST(doc_id AS BIGINT) AS bid FROM documents
         |      WHERE doc_id < 64),
         |pos AS (SELECT CAST(t1.range AS BIGINT) AS x,
         |          CAST(t2.range AS BIGINT) AS y
         |        FROM range(0, 8) t1 CROSS JOIN range(0, 8) t2),
         |px AS (SELECT bid, x, y,
         |         (bid*37 + x*16 + y*7 +
         |          ((bid+1)*(x+3)*(y+5)) % 31) % 256 AS p
         |       FROM b CROSS JOIN pos),
         |fwd AS (SELECT px.bid, m1.u, m2.u AS v,
         |          sum((px.p - 128) * m1.c * m2.c) AS f
         |        FROM px JOIN m m1 ON m1.x = px.x
         |                JOIN m m2 ON m2.x = px.y
         |        GROUP BY px.bid, m1.u, m2.u),
         |cf AS (SELECT qt.quality, fwd.bid, fwd.u, fwd.v,
         |         (CASE WHEN fwd.f < 0 THEN -1 ELSE 1 END) *
         |           ((abs(fwd.f) + (CAST(qt.q AS BIGINT) * 67108864) // 2)
         |             // (CAST(qt.q AS BIGINT) * 67108864)) AS code,
         |         qt.q
         |       FROM fwd JOIN qt ON qt.u = fwd.u AND qt.v = fwd.v),
         |inv AS (SELECT cf.quality, cf.bid, n1.x, n2.x AS y,
         |          sum(cf.code * cf.q * n1.c * n2.c) AS g
         |        FROM cf JOIN m n1 ON n1.u = cf.u
         |                JOIN m n2 ON n2.u = cf.v
         |        GROUP BY cf.quality, cf.bid, n1.x, n2.x),
         |rec AS (SELECT quality, bid, x, y,
         |          greatest(0, least(255,
         |            (CASE WHEN g < 0 THEN -1 ELSE 1 END) *
         |              ((abs(g) + 33554432) // 67108864) + 128)) AS p2
         |        FROM inv),
         |err AS (SELECT r.quality, r.bid, abs(r.p2 - px.p) AS e
         |        FROM rec r JOIN px ON px.bid = r.bid
         |          AND px.x = r.x AND px.y = r.y),
         |nz AS (SELECT quality,
         |         sum(CASE WHEN code <> 0 THEN 1 ELSE 0 END) AS nnz
         |       FROM cf GROUP BY quality)
         |SELECT e.quality, CAST(count(*) / 64 AS BIGINT) AS n_blocks,
         |  CAST(max(e.e) AS BIGINT) AS max_abs_err,
         |  CAST(sum(e.e * e.e) AS BIGINT) AS sse,
         |  CAST(max(nz.nnz) AS BIGINT) AS nnz
         |FROM err e JOIN nz ON nz.quality = e.quality
         |GROUP BY e.quality ORDER BY e.quality""".stripMargin
    },
    // q238's code CTEs + the zigzag VALUES walk, runs via lag over
    // the nonzero positions, same fixed-width symbol model
    "q240_dct_size" -> {
      import graft.multimodal.Dct
      val quantRows = Seq(10, 50, 90).flatMap { q =>
        for (u <- 0 until 8; v <- 0 until 8)
          yield s"($q,$u,$v,${Dct.quantStep(u, v, q)})"
      }.mkString(", ")
      s"""WITH m(u, x, c) AS (VALUES ${Dct.basisSqlValues}),
         |qt(quality, u, v, q) AS (VALUES $quantRows),
         |zig(i, u, v) AS (VALUES ${Dct.zigzagSqlValues}),
         |b AS (SELECT CAST(doc_id AS BIGINT) AS bid FROM documents
         |      WHERE doc_id < 64),
         |pos AS (SELECT CAST(t1.range AS BIGINT) AS x,
         |          CAST(t2.range AS BIGINT) AS y
         |        FROM range(0, 8) t1 CROSS JOIN range(0, 8) t2),
         |px AS (SELECT bid, x, y,
         |         (bid*37 + x*16 + y*7 +
         |          ((bid+1)*(x+3)*(y+5)) % 31) % 256 AS p
         |       FROM b CROSS JOIN pos),
         |fwd AS (SELECT px.bid, m1.u, m2.u AS v,
         |          sum((px.p - 128) * m1.c * m2.c) AS f
         |        FROM px JOIN m m1 ON m1.x = px.x
         |                JOIN m m2 ON m2.x = px.y
         |        GROUP BY px.bid, m1.u, m2.u),
         |cf AS (SELECT qt.quality, fwd.bid, fwd.u, fwd.v,
         |         (CASE WHEN fwd.f < 0 THEN -1 ELSE 1 END) *
         |           ((abs(fwd.f) + (CAST(qt.q AS BIGINT) * 67108864) // 2)
         |             // (CAST(qt.q AS BIGINT) * 67108864)) AS code
         |       FROM fwd JOIN qt ON qt.u = fwd.u AND qt.v = fwd.v),
         |zc AS (SELECT cf.quality, cf.bid, z.i, cf.code
         |       FROM cf JOIN zig z ON z.u = cf.u AND z.v = cf.v),
         |dc AS (SELECT quality, bid,
         |         4 + CASE WHEN code = 0 THEN 0
         |                  ELSE length(bin(abs(code))) END AS dbits
         |       FROM zc WHERE i = 0),
         |acnz AS (SELECT quality, bid, i, code,
         |           coalesce(lag(i) OVER (PARTITION BY quality, bid
         |             ORDER BY i), 0) AS prev
         |         FROM zc WHERE i > 0 AND code <> 0),
         |acb AS (SELECT quality, bid,
         |          sum(8 * ((i - prev - 1) // 16) + 8 +
         |            length(bin(abs(code)))) AS abits,
         |          count(*) AS nnz, max(i) AS last_nz
         |        FROM acnz GROUP BY quality, bid),
         |per AS (SELECT d.quality, d.bid,
         |          d.dbits + coalesce(a.abits, 0) +
         |            CASE WHEN coalesce(a.last_nz, 0) < 63
         |                 THEN 4 ELSE 0 END AS bits,
         |          coalesce(a.nnz, 0) AS nnz
         |        FROM dc d LEFT JOIN acb a
         |          ON a.quality = d.quality AND a.bid = d.bid)
         |SELECT quality, CAST(count(*) AS BIGINT) AS n_blocks,
         |  CAST(sum(bits) AS BIGINT) AS total_bits,
         |  CAST(sum(nnz) AS BIGINT) AS nnz_ac,
         |  CAST(sum(bits) * 1000000 // (count(*) * 512) AS BIGINT)
         |    AS ratio_e6
         |FROM per GROUP BY quality ORDER BY quality""".stripMargin
    },
    "q143_media_headers" ->
      """SELECT doc_id,
        |  CAST(doc_id % 512 + 16 AS BIGINT) AS width,
        |  CAST(doc_id % 384 + 16 AS BIGINT) AS height,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(8000 + (doc_id % 5) * 1000 AS BIGINT) AS sample_rate,
        |  CAST(floor(1000.0 * ((doc_id % 1000 + 1) * 64)
        |       / ((8000 + (doc_id % 5) * 1000) * (doc_id % 2 + 1) * 2))
        |    AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q144_image_phash" ->
      s"""WITH $phashCte
         |SELECT doc_id, phash FROM h ORDER BY doc_id""".stripMargin,
    "q224_audio_frames" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 200 + 50 AS n FROM documents
        |  WHERE doc_id < 100),
        |fr AS (SELECT doc_id, n, f.range AS f
        |  FROM d, range(0, 32) f WHERE f.range * 32 + 64 <= n),
        |sm AS (SELECT doc_id, f, j.range AS j,
        |    f * 32 + j.range AS i
        |  FROM fr, range(0, 64) j),
        |x AS (SELECT doc_id, f, j,
        |    ((i*i + doc_id*31 + i*7) % 4096) - 2048 AS v,
        |    CASE WHEN j > 0 THEN
        |      (((i-1)*(i-1) + doc_id*31 + (i-1)*7) % 4096) - 2048
        |    END AS pv
        |  FROM sm)
        |SELECT doc_id, CAST(f AS INT) AS frame,
        |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN j > 0 AND ((v >= 0) != (pv >= 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
        |  CAST(max(abs(v)) AS BIGINT) AS peak
        |FROM x GROUP BY doc_id, f
        |ORDER BY doc_id, frame""".stripMargin,
    "q223_image_patches" ->
      """WITH px AS (
        |  SELECT d.doc_id, d.doc_id - d.doc_id % 5 AS base,
        |         d.doc_id % 5 AS v, x.range AS x, y.range AS y
        |  FROM documents d, range(0, 36) x, range(0, 28) y
        |  WHERE d.doc_id < 50),
        |g AS (
        |  SELECT doc_id, x, y,
        |    CASE WHEN v > 0 AND (x + y*36 + v*13) % 101 = 0
        |      THEN ((x*(3 + base % 11) + y*(5 + base % 13)
        |             + ((x*y + base) % 17) * 15) % 256 + 128) % 256
        |      ELSE (x*(3 + base % 11) + y*(5 + base % 13)
        |            + ((x*y + base) % 17) * 15) % 256 END AS gray
        |  FROM px)
        |SELECT doc_id, CAST(y // 4 AS INT) AS patch_row,
        |  CAST(x // 4 AS INT) AS patch_col,
        |  CAST(sum(gray) AS BIGINT) AS p_sum,
        |  CAST(min(gray) AS BIGINT) AS p_min,
        |  CAST(max(gray) AS BIGINT) AS p_max
        |FROM g GROUP BY doc_id, patch_row, patch_col
        |ORDER BY doc_id, patch_row, patch_col""".stripMargin,
    "q145_image_phash_pairs" ->
      s"""WITH $phashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  cast(bit_count(xor(a.phash, b.phash)) as int) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Replays the q147 waveform formula + integer features in SQL:
    // 16-bit PCM round-trips losslessly, so the decoded samples ARE
    // the formula. energy divides an exactly-representable integer
    // sum by a double count (identical IEEE op both engines) before
    // flooring; zcr lags over sign(s) with zeros dropped.
    "q147_audio_features" ->
      """WITH ds AS (
        |  SELECT d.doc_id, i.range AS i,
        |    ((i.range*i.range + d.doc_id*31 + i.range*7) % 4096) - 2048
        |      AS s
        |  FROM documents d, range(0, 250) i
        |  WHERE d.doc_id < 200 AND i.range < d.doc_id % 200 + 50),
        |sg AS (
        |  SELECT doc_id, i,
        |    CASE WHEN s > 0 THEN 1 ELSE -1 END AS sg
        |  FROM ds WHERE s <> 0),
        |zc AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN sg <> prev THEN 1 ELSE 0 END) AS BIGINT)
        |      AS zcr
        |  FROM (SELECT doc_id, sg,
        |          lag(sg) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |        FROM sg)
        |  WHERE prev IS NOT NULL GROUP BY doc_id),
        |ag AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(floor(sum(CAST(s AS BIGINT) * s)
        |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS energy_fx,
        |    CAST(max(abs(s)) AS BIGINT) AS peak
        |  FROM ds GROUP BY doc_id)
        |SELECT a.doc_id, a.n_samples, a.energy_fx,
        |  coalesce(zc.zcr, 0) AS zcr, a.peak
        |FROM ag a LEFT JOIN zc USING (doc_id) ORDER BY a.doc_id""".stripMargin,
    "q148_video_frames" ->
      s"""WITH $videoCte
         |SELECT doc_id, CAST(f AS INT) AS frame_idx, phash
         |FROM vh ORDER BY doc_id, frame_idx""".stripMargin,
    "q149_video_neardup" ->
      s"""WITH $videoCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_frames
         |FROM vh a JOIN vh b ON a.f = b.f AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY doc_a, doc_b""".stripMargin,
    // G.711 μ-law is integer-exact, so the lossy round-trip replays
    // FULLY in SQL: threshold-chain exponent (equal to the bit-scan
    // loop on all 65536 inputs — G711Spec pins the sweep), then
    // shifts/masks for code and reconstruction. Every decoded sample
    // reaches the md5 stream digest; nothing is tolerance-banded.
    "q155_g711_roundtrip" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 200 + 50 AS n FROM documents
        |  WHERE doc_id < 200),
        |s AS (
        |  SELECT doc_id, i.range AS i,
        |    CAST(((i.range*i.range + doc_id*31 + i.range*7) % 4096) - 2048
        |      AS INT) AS x
        |  FROM d, range(0, 250) i WHERE i.range < d.n),
        |e AS (
        |  SELECT doc_id, i, x,
        |    CASE WHEN x < 0 THEN 128 ELSE 0 END AS sign,
        |    least(CASE WHEN x < 0 THEN -x ELSE x END, 32635) + 132 AS xb
        |  FROM s),
        |u AS (
        |  SELECT doc_id, i, x, sign, xb,
        |    CASE WHEN xb >= 16384 THEN 7 WHEN xb >= 8192 THEN 6
        |         WHEN xb >= 4096 THEN 5 WHEN xb >= 2048 THEN 4
        |         WHEN xb >= 1024 THEN 3 WHEN xb >= 512 THEN 2
        |         WHEN xb >= 256 THEN 1 ELSE 0 END AS ex
        |  FROM e),
        |c AS (
        |  SELECT doc_id, i, x,
        |    255 - (sign | (ex << 4) | ((xb >> (ex + 3)) & 15)) AS code
        |  FROM u),
        |dc AS (
        |  SELECT doc_id, i, x, 255 - code AS ui FROM c),
        |dec AS (
        |  SELECT doc_id, i, x,
        |    CASE WHEN (ui & 128) <> 0
        |      THEN -(((((ui & 15) << 3) + 132) << ((ui >> 4) & 7)) - 132)
        |      ELSE ((((ui & 15) << 3) + 132) << ((ui >> 4) & 7)) - 132
        |    END AS y
        |  FROM dc)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(max(abs(y - x)) AS BIGINT) AS max_abs_err,
        |  CAST(sum(abs(y - x)) AS BIGINT) AS sum_abs_err,
        |  md5(string_agg(CAST(y AS VARCHAR), ',' ORDER BY i)) AS dec_md5
        |FROM dec GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // A-law replay: floor-div-by-8 pre-shift (CASE-safe for negative
    // samples), value-threshold segment chain, even-bit inversion via
    // xor(·, 0xD5/0x55), then the inverse shifts — every decoded
    // sample reaches the md5 stream digest, exactly like q155.
    "q157_alaw_roundtrip" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 200 + 50 AS n FROM documents
        |  WHERE doc_id < 200),
        |s AS (
        |  SELECT doc_id, i.range AS i,
        |    CAST(((i.range*i.range*37 + doc_id*131 + i.range*11) % 65536)
        |      - 32768 AS INT) AS x
        |  FROM d, range(0, 250) i WHERE i.range < d.n),
        |p AS (
        |  SELECT doc_id, i, x,
        |    CASE WHEN x >= 0 THEN x >> 3 ELSE -((-x + 7) >> 3) END AS pv
        |  FROM s),
        |m AS (
        |  SELECT doc_id, i, x,
        |    CASE WHEN pv >= 0 THEN 213 ELSE 85 END AS mask,
        |    CASE WHEN pv >= 0 THEN pv ELSE -pv - 1 END AS xm
        |  FROM p),
        |g AS (
        |  SELECT doc_id, i, x, mask, xm,
        |    CASE WHEN xm <= 31 THEN 0 WHEN xm <= 63 THEN 1
        |         WHEN xm <= 127 THEN 2 WHEN xm <= 255 THEN 3
        |         WHEN xm <= 511 THEN 4 WHEN xm <= 1023 THEN 5
        |         WHEN xm <= 2047 THEN 6 WHEN xm <= 4095 THEN 7
        |         ELSE 8 END AS seg
        |  FROM m),
        |c AS (
        |  SELECT doc_id, i, x,
        |    CASE WHEN seg >= 8 THEN xor(127, mask)
        |         ELSE xor((seg << 4) |
        |           (CASE WHEN seg < 2 THEN (xm >> 1) & 15
        |                 ELSE (xm >> seg) & 15 END), mask)
        |    END AS code
        |  FROM g),
        |dc AS (SELECT doc_id, i, x, xor(code, 85) & 255 AS a FROM c),
        |dt AS (
        |  SELECT doc_id, i, x, a,
        |    CASE WHEN ((a & 112) >> 4) = 0 THEN ((a & 15) << 4) + 8
        |         WHEN ((a & 112) >> 4) = 1 THEN ((a & 15) << 4) + 264
        |         ELSE (((a & 15) << 4) + 264) << (((a & 112) >> 4) - 1)
        |    END AS t
        |  FROM dc),
        |dec AS (
        |  SELECT doc_id, i, x,
        |    CASE WHEN (a & 128) <> 0 THEN t ELSE -t END AS y
        |  FROM dt)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(max(abs(y - x)) AS BIGINT) AS max_abs_err,
        |  CAST(sum(abs(y - x)) AS BIGINT) AS sum_abs_err,
        |  md5(string_agg(CAST(y AS VARCHAR), ',' ORDER BY i)) AS dec_md5
        |FROM dec GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // ADPCM replay: the encoder's quantize + the decoder-mirrored
    // reconstruction walk sample-by-sample in a RECURSIVE CTE (state
    // = (predictor, step-index) per doc; LATERAL chain stages the
    // intermediate integers because the recursive SELECT list must
    // keep the anchor's arity). Step/index tables are injected from
    // ImaAdpcm so Scala and SQL share one source of truth. Every
    // decoded sample reaches the md5 stream digest.
    "q160_adpcm_roundtrip" -> {
      val st = ImaAdpcm.StepTable.mkString("[", ",", "]")
      val it = ImaAdpcm.IndexTable.mkString("[", ",", "]")
      s"""WITH RECURSIVE
         |g AS (
         |  SELECT doc_id,
         |    list_transform(range(0, doc_id % 200 + 50),
         |      i -> CAST((i*i*37 + doc_id*131 + i*11) % 65536 - 32768
         |        AS INTEGER)) AS x
         |  FROM documents WHERE doc_id < 200),
         |rec AS (
         |  SELECT doc_id, 0 AS pos, 0 AS pred, 0 AS idx,
         |         CAST('' AS VARCHAR) AS acc, 0 AS maxe,
         |         CAST(0 AS BIGINT) AS sume
         |  FROM g
         |  UNION ALL
         |  SELECT r.doc_id, r.pos + 1, z5.npred, z5.nidx,
         |         r.acc || CASE WHEN r.pos = 0 THEN '' ELSE ',' END
         |               || CAST(z5.npred AS VARCHAR),
         |         greatest(r.maxe, z6.err), r.sume + z6.err
         |  FROM rec r JOIN g USING (doc_id),
         |  LATERAL (SELECT g.x[r.pos + 1] AS xv,
         |                  ($st)[r.idx + 1] AS step) z1,
         |  LATERAL (SELECT z1.xv - r.pred AS diff) z2,
         |  LATERAL (SELECT CASE WHEN z2.diff < 0 THEN 8 ELSE 0 END AS sgn,
         |                  abs(z2.diff) AS ad0) z3,
         |  LATERAL (SELECT CASE WHEN z3.ad0 >= z1.step
         |                       THEN 4 ELSE 0 END AS b2) z3a,
         |  LATERAL (SELECT z3.ad0 - CASE WHEN z3a.b2 = 4
         |                       THEN z1.step ELSE 0 END AS ad1) z3b,
         |  LATERAL (SELECT CASE WHEN z3b.ad1 >= z1.step // 2
         |                       THEN 2 ELSE 0 END AS b1) z3c,
         |  LATERAL (SELECT CASE WHEN z3b.ad1 - CASE WHEN z3c.b1 = 2
         |                         THEN z1.step // 2 ELSE 0 END
         |                       >= z1.step // 4
         |                       THEN 1 ELSE 0 END AS b0) z3d,
         |  LATERAL (SELECT z1.step // 8
         |                + CASE WHEN z3a.b2 = 4 THEN z1.step ELSE 0 END
         |                + CASE WHEN z3c.b1 = 2 THEN z1.step // 2 ELSE 0 END
         |                + CASE WHEN z3d.b0 = 1 THEN z1.step // 4 ELSE 0 END
         |                  AS v) z4,
         |  LATERAL (SELECT greatest(-32768, least(32767,
         |             CASE WHEN z3.sgn = 8 THEN r.pred - z4.v
         |                  ELSE r.pred + z4.v END)) AS npred,
         |           greatest(0, least(88, r.idx +
         |             ($it)[z3a.b2 + z3c.b1 + z3d.b0 + 1])) AS nidx) z5,
         |  LATERAL (SELECT abs(z1.xv - z5.npred) AS err) z6
         |  WHERE r.pos < len(g.x))
         |SELECT r.doc_id, CAST(len(g.x) AS BIGINT) AS n_samples,
         |  CAST(r.maxe AS BIGINT) AS max_abs_err, r.sume AS sum_abs_err,
         |  md5(r.acc) AS dec_md5
         |FROM rec r JOIN g USING (doc_id)
         |WHERE r.pos = len(g.x)
         |ORDER BY r.doc_id""".stripMargin
    },
    // Lossy codec: the oracle pins what is exactly replayable for a
    // real JPEG — parsed dims, decoded pixel count, bounded error —
    // not pixel values (those belong to MultimodalSpec's tight bands).
    "q152_jpeg_roundtrip" ->
      """SELECT doc_id,
        |  CAST(36 AS INT) AS width, CAST(28 AS INT) AS height,
        |  CAST(36 * 28 AS INT) AS n_pixels, TRUE AS err_bounded
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin
  )

  // The q148 video formula + per-frame block means + dHash bits in
  // SQL — decode(encode) is lossless per frame and the container
  // walk is extent-exact, so replaying the formula replays what the
  // real walk + decode must produce.
  private val videoCte: String =
    """vpx AS (
      |  SELECT d.doc_id, d.doc_id - d.doc_id % 5 AS base,
      |         d.doc_id % 5 AS v, f.range AS f, x.range AS x,
      |         y.range AS y
      |  FROM documents d, range(0, 4) f, range(0, 36) x, range(0, 28) y
      |  WHERE d.doc_id < 200 AND f.range < d.doc_id % 3 + 2),
      |vg AS (
      |  SELECT doc_id, f, x, y,
      |    CASE WHEN v > 0 AND (x + y*36 + v*13 + f) % 101 = 0
      |      THEN ((x*(3 + (base + f) % 11) + y*(5 + (base + f) % 13)
      |             + ((x*y + base + f*7) % 17) * 15) % 256 + 128) % 256
      |      ELSE (x*(3 + (base + f) % 11) + y*(5 + (base + f) % 13)
      |            + ((x*y + base + f*7) % 17) * 15) % 256 END AS gray
      |  FROM vpx),
      |vb AS (
      |  SELECT doc_id, f, x // 4 AS bx, y // 4 AS by,
      |         cast(sum(gray) // 16 AS BIGINT) AS m
      |  FROM vg GROUP BY doc_id, f, x // 4, y // 4),
      |vbits AS (
      |  SELECT a.doc_id, a.f,
      |    CASE WHEN b.m > a.m THEN 1::BIGINT << (a.by*8 + a.bx)
      |         ELSE 0 END AS s
      |  FROM vb a JOIN vb b
      |    ON b.doc_id = a.doc_id AND b.f = a.f
      |   AND b.by = a.by AND b.bx = a.bx + 1
      |  WHERE a.bx < 8),
      |vh AS (
      |  SELECT doc_id, f, cast(sum(s) AS BIGINT) AS phash
      |  FROM vbits GROUP BY doc_id, f)""".stripMargin

  // Replays the q144 image formula + integer block means + dHash
  // bits entirely in SQL: decode(encode(x)) == x for lossless
  // 8-bit-gray PNG, so the oracle needs no codec — it recomputes
  // what the real decode must return.
  private val phashCte: String =
    """px AS (
      |  SELECT d.doc_id, d.doc_id - d.doc_id % 5 AS base,
      |         d.doc_id % 5 AS v, x.range AS x, y.range AS y
      |  FROM documents d, range(0, 36) x, range(0, 28) y
      |  WHERE d.doc_id < 200),
      |g AS (
      |  SELECT doc_id, x, y,
      |    CASE WHEN v > 0 AND (x + y*36 + v*13) % 101 = 0
      |      THEN ((x*(3 + base % 11) + y*(5 + base % 13)
      |             + ((x*y + base) % 17) * 15) % 256 + 128) % 256
      |      ELSE (x*(3 + base % 11) + y*(5 + base % 13)
      |            + ((x*y + base) % 17) * 15) % 256 END AS gray
      |  FROM px),
      |blocks AS (
      |  SELECT doc_id, x // 4 AS bx, y // 4 AS by,
      |         cast(sum(gray) // 16 AS BIGINT) AS m
      |  FROM g GROUP BY doc_id, x // 4, y // 4),
      |bits AS (
      |  SELECT a.doc_id,
      |    CASE WHEN b.m > a.m THEN 1::BIGINT << (a.by*8 + a.bx)
      |         ELSE 0 END AS s
      |  FROM blocks a JOIN blocks b
      |    ON b.doc_id = a.doc_id AND b.by = a.by AND b.bx = a.bx + 1
      |  WHERE a.bx < 8),
      |h AS (
      |  SELECT doc_id, cast(sum(s) AS BIGINT) AS phash
      |  FROM bits GROUP BY doc_id)""".stripMargin
}
