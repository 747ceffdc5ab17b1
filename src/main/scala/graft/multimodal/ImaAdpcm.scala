package graft.multimodal

import org.apache.spark.sql.functions.udf

/** IMA/DVI4 ADPCM — the STATEFUL member of the telephony codec
  * family (G.711 μ-law/A-law are per-sample maps; ADPCM carries a
  * (predictor, step-index) state across samples for 4:1
  * compression). The entire recurrence is exact integer arithmetic
  * (table lookups, shifts-as-truncating-division, clamps), so unlike
  * perceptual codecs the round-trip replays bit-for-bit in SQL: the
  * q160 oracle walks the same recurrence with a recursive CTE and
  * every decoded sample, the error sums, and the stream digest must
  * hash-match.
  *
  * Arithmetic follows the canonical public-domain IMA reference
  * (Intel/DVI ADPCM, the form in RFC 3551 §4.5.1 / multimedia
  * literature): 89-entry step table, {-1,-1,-1,-1,2,4,6,8} index
  * adjustments, encoder mirrors the decoder's reconstruction so
  * error never accumulates beyond one quantization step.
  *
  * Scale shape: state lives WITHIN one row's sample array — the
  * per-row UDF is still a pure map over the corpus, no shuffle, no
  * cross-row state; a 100 TB transcode rides the scan like the
  * G.711/PNG/JPEG kernels.
  */
object ImaAdpcm {

  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIndex(i: Int): Int =
    if (i < 0) 0 else if (i > 88) 88 else i

  private def clampSample(s: Int): Int =
    if (s < -32768) -32768 else if (s > 32767) 32767 else s

  /** Decoder-mirrored reconstruction step: given the 4-bit code and
    * the current step, the predictor delta both sides apply.
    */
  private def vpdiff(delta: Int, step: Int): Int = {
    var v = step >> 3
    if ((delta & 4) != 0) v += step
    if ((delta & 2) != 0) v += step >> 1
    if ((delta & 1) != 0) v += step >> 2
    v
  }

  /** Encode 16-bit samples to 4-bit codes (one Int 0..15 per sample;
    * nibble packing is presentation, not arithmetic, and is left to
    * the container). Initial state: predictor 0, index 0.
    */
  def encode(samples: Array[Int]): Array[Int] = {
    val out = new Array[Int](samples.length)
    var pred = 0
    var idx = 0
    var i = 0
    while (i < samples.length) {
      val step = StepTable(idx)
      val diff = samples(i) - pred
      val sign = if (diff < 0) 8 else 0
      var ad = if (diff < 0) -diff else diff
      var delta = 0
      if (ad >= step) { delta = 4; ad -= step }
      if (ad >= (step >> 1)) { delta |= 2; ad -= step >> 1 }
      if (ad >= (step >> 2)) delta |= 1
      delta |= sign
      val v = vpdiff(delta, step)
      pred = clampSample(if (sign != 0) pred - v else pred + v)
      idx = clampIndex(idx + IndexTable(delta & 7))
      out(i) = delta
      i += 1
    }
    out
  }

  /** Decode 4-bit codes back to 16-bit samples. Pure function of the
    * code stream: initial state (0, 0) as in [[encode]].
    */
  def decode(codes: Array[Int]): Array[Int] = {
    val out = new Array[Int](codes.length)
    var pred = 0
    var idx = 0
    var i = 0
    while (i < codes.length) {
      val delta = codes(i) & 0xF
      val step = StepTable(idx)
      val v = vpdiff(delta, step)
      pred = clampSample(if ((delta & 8) != 0) pred - v else pred + v)
      idx = clampIndex(idx + IndexTable(delta & 7))
      out(i) = pred
      i += 1
    }
    out
  }

  def encodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (samples: Seq[Int]) => encode(samples.toArray).toSeq }

  def decodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (codes: Seq[Int]) => decode(codes.toArray).toSeq }
}
