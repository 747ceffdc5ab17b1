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
  * tested; the codec boundary (actual JPEG/WAV decode) is a STUB in
  * this environment (no image/audio libraries in the container) with
  * a deterministic byte-level fake standing in, clearly marked below.
  * Swapping the stub for a real codec changes no plan shape: the
  * kernels are per-row/per-partition maps with no shuffle, which is
  * exactly how a decode stage must behave at 100 TB (decode cost
  * scales out with partitions; nothing ever collects).
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
