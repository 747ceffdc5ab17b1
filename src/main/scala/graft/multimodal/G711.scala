package graft.multimodal

import org.apache.spark.sql.functions.udf

/** ITU-T G.711 μ-law — a REAL, standardized lossy audio codec in
  * pure integer math (telephony's 2:1 companding: 16-bit PCM →
  * 8-bit log-quantized code). Unlike perceptual codecs (MP3-class,
  * which the JDK cannot decode and stay stubbed), μ-law's
  * encode/decode is exact integer arithmetic, so a round-trip query
  * can carry a FULL hash oracle: DuckDB replays the companding
  * bit-for-bit (threshold-chain exponent + shifts/masks — verified
  * equal to the loop form on all 65536 inputs) and every decoded
  * sample must match. Quantization error is bounded by construction
  * (≤ 644 absolute at full scale, ~2%), which the spec pins.
  *
  * Scale shape: both directions are per-sample maps inside a UDF
  * over the sample array — no shuffle, no state; a 100 TB audio
  * transcode rides the scan exactly like the PNG/JPEG kernels.
  */
object G711 {

  private val Bias = 0x84
  private val Clip = 32635

  /** One 16-bit sample → μ-law code (0..255). */
  def linearToUlaw(s: Int): Int = {
    val sign = if (s < 0) 0x80 else 0
    var x = math.min(if (s < 0) -s else s, Clip) + Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0F
    ~(sign | (exp << 4) | mant) & 0xFF
  }

  /** μ-law code (0..255) → 16-bit sample. */
  def ulawToLinear(u0: Int): Int = {
    val u = ~u0 & 0xFF
    val exp = (u >> 4) & 7
    val x = ((((u & 0x0F) << 3) + Bias) << exp) - Bias
    if ((u & 0x80) != 0) -x else x
  }

  def encodeUlaw(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      out(i) = linearToUlaw(samples(i)).toByte; i += 1
    }
    out
  }

  def decodeUlaw(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = ulawToLinear(bytes(i) & 0xFF); i += 1
    }
    out
  }

  def ulawEncodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (samples: Seq[Int]) => encodeUlaw(samples.toArray) }

  def ulawDecodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) => decodeUlaw(bytes).toSeq }
}
