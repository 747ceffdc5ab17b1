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

  // ---- A-law: μ-law's telephony companion (E1 regions), the same
  // threshold-chain structure in a 13-bit magnitude domain (the
  // 16-bit sample pre-shifts by 3). Like μ-law it is exact integer
  // arithmetic — q157 carries a full per-sample hash oracle, and
  // G711Spec sweeps all 65536 inputs. Arithmetic follows the
  // canonical public-domain g711.c (Sun/ITU): segment ends 0x1F..
  // 0xFFF, even-bit inversion masks 0xD5/0x55.

  /** One 16-bit sample → A-law code (0..255). */
  def linearToAlaw(s: Int): Int = {
    // arithmetic >> 3 == floor(s/8), spelled CASE-safe for the SQL twin
    val p = if (s >= 0) s >> 3 else -((-s + 7) >> 3)
    val mask = if (p >= 0) 0xD5 else 0x55
    val x = if (p >= 0) p else -p - 1
    val seg =
      if (x <= 0x1F) 0 else if (x <= 0x3F) 1 else if (x <= 0x7F) 2
      else if (x <= 0xFF) 3 else if (x <= 0x1FF) 4 else if (x <= 0x3FF) 5
      else if (x <= 0x7FF) 6 else if (x <= 0xFFF) 7 else 8
    if (seg >= 8) 0x7F ^ mask
    else {
      val low = if (seg < 2) (x >> 1) & 0xF else (x >> seg) & 0xF
      ((seg << 4) | low) ^ mask
    }
  }

  /** A-law code (0..255) → 16-bit sample. */
  def alawToLinear(c: Int): Int = {
    val a = (c ^ 0x55) & 0xFF
    val t0 = (a & 0xF) << 4
    val seg = (a & 0x70) >> 4
    val t =
      if (seg == 0) t0 + 8
      else if (seg == 1) t0 + 0x108
      else (t0 + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  def encodeAlaw(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      out(i) = linearToAlaw(samples(i)).toByte; i += 1
    }
    out
  }

  def decodeAlaw(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = alawToLinear(bytes(i) & 0xFF); i += 1
    }
    out
  }

  def alawEncodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (samples: Seq[Int]) => encodeAlaw(samples.toArray) }

  def alawDecodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) => decodeAlaw(bytes).toSeq }
}
