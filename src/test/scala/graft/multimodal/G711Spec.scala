package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class G711Spec extends AnyFunSuite {

  test("golden μ-law codes and reconstructions (ITU-T G.711)") {
    // canonical fixed points of the companding law
    assert(G711.linearToUlaw(0) == 0xFF)
    assert(G711.linearToUlaw(1) == 0xFF) // sub-step positives share code
    assert(G711.linearToUlaw(-1) == 0x7F)
    assert(G711.linearToUlaw(32635) == 0x80) // positive clip
    assert(G711.linearToUlaw(32767) == 0x80) // beyond clip → same code
    assert(G711.linearToUlaw(-32768) == 0x00) // negative full scale
    assert(G711.ulawToLinear(0xFF) == 0)
    assert(G711.ulawToLinear(0x7F) == 0) // both zero codes decode to 0
    assert(G711.ulawToLinear(0x80) == 32124) // top positive segment
  }

  test("threshold-chain exponent (the SQL oracle form) equals the " +
      "bit-scan loop on ALL 65536 inputs") {
    // the q155 oracle derives the segment exponent by value
    // thresholds instead of the bit scan; if the two forms ever
    // disagree the hash compare would break — pin the full sweep
    def sqlForm(s: Int): Int = {
      val sign = if (s < 0) 128 else 0
      val xb = math.min(if (s < 0) -s else s, 32635) + 132
      val ex =
        if (xb >= 16384) 7 else if (xb >= 8192) 6 else if (xb >= 4096) 5
        else if (xb >= 2048) 4 else if (xb >= 1024) 3 else if (xb >= 512) 2
        else if (xb >= 256) 1 else 0
      255 - (sign | (ex << 4) | ((xb >> (ex + 3)) & 15))
    }
    (-32768 to 32767).foreach { s =>
      assert(sqlForm(s) == G711.linearToUlaw(s), s"sample $s")
    }
  }

  test("round-trip error is bounded and decode is codec-consistent") {
    var maxErr = 0
    (-32768 to 32767).foreach { s =>
      val y = G711.ulawToLinear(G711.linearToUlaw(s))
      maxErr = math.max(maxErr,
        math.abs(y - math.max(-32635, math.min(s, 32635))))
      // decoded values are stable under a second trip: decode∘encode
      // is the identity on the codec's own output (note encode alone
      // is NOT injective there — +0 and -0 share magnitude but not
      // code, so we pin the decoded value, not the code)
      assert(G711.ulawToLinear(G711.linearToUlaw(y)) == y, s"stability $s")
    }
    // largest segment step is 256 (exp 7): error ≤ half the top-
    // segment step after bias handling; measured 511 within clip
    assert(maxErr <= 512, s"max quantization error $maxErr")
  }

  test("array codec round-trips through bytes") {
    val samples = Array(0, 1, -1, 100, -100, 5000, -5000, 32767, -32768)
    val bytes = G711.encodeUlaw(samples)
    assert(bytes.length == samples.length)
    val dec = G711.decodeUlaw(bytes)
    samples.zip(dec).foreach { case (s, y) =>
      assert(math.abs(s.max(-32635).min(32635) - y) <= 512)
    }
  }

  // ---- A-law (q157) ----

  test("golden A-law codes and reconstructions (ITU-T G.711)") {
    // even-bit inversion fixed points of the canonical g711.c law
    assert(G711.linearToAlaw(0) == 0xD5)    // +0 → mask alone
    assert(G711.linearToAlaw(-1) == 0x55)   // -1 maps to magnitude 0
    assert(G711.linearToAlaw(32767) == 0xAA) // positive full scale
    assert(G711.linearToAlaw(-32768) == 0x2A) // negative full scale
    assert(G711.alawToLinear(0xD5) == 8)    // no true zero
    assert(G711.alawToLinear(0x55) == -8)
    assert(G711.alawToLinear(0xAA) == 32256) // top positive segment
    assert(G711.alawToLinear(0x2A) == -32256)
  }

  test("A-law: the SQL oracle form equals the Scala kernel on ALL 65536 inputs") {
    // replicate the q157 oracle's CASE chain verbatim; any divergence
    // breaks the hash compare
    def sqlForm(x: Int): Int = {
      val pv = if (x >= 0) x >> 3 else -((-x + 7) >> 3)
      val mask = if (pv >= 0) 213 else 85
      val xm = if (pv >= 0) pv else -pv - 1
      val seg =
        if (xm <= 31) 0 else if (xm <= 63) 1 else if (xm <= 127) 2
        else if (xm <= 255) 3 else if (xm <= 511) 4 else if (xm <= 1023) 5
        else if (xm <= 2047) 6 else if (xm <= 4095) 7 else 8
      if (seg >= 8) 127 ^ mask
      else ((seg << 4) |
        (if (seg < 2) (xm >> 1) & 15 else (xm >> seg) & 15)) ^ mask
    }
    def sqlDecode(code: Int): Int = {
      val a = (code ^ 85) & 255
      val t =
        if (((a & 112) >> 4) == 0) ((a & 15) << 4) + 8
        else if (((a & 112) >> 4) == 1) ((a & 15) << 4) + 264
        else (((a & 15) << 4) + 264) << (((a & 112) >> 4) - 1)
      if ((a & 128) != 0) t else -t
    }
    (-32768 to 32767).foreach { s =>
      assert(sqlForm(s) == G711.linearToAlaw(s), s"encode $s")
    }
    (0 to 255).foreach { c =>
      assert(sqlDecode(c) == G711.alawToLinear(c), s"decode $c")
    }
  }

  test("A-law round-trip error is bounded and decode is codec-consistent") {
    var maxErr = 0
    (-32768 to 32767).foreach { s =>
      val y = G711.alawToLinear(G711.linearToAlaw(s))
      maxErr = math.max(maxErr, math.abs(y - s))
      // decode∘encode is the identity on the codec's own output
      assert(G711.alawToLinear(G711.linearToAlaw(y)) == y, s"stability $s")
    }
    // top segment step is 1024 in the 16-bit domain (64 in the
    // 13-bit domain × 8, plus the ±7 pre-shift truncation): half-step
    // reconstruction keeps |err| ≤ 512 + 7 wait-for-measurement —
    // the sweep measures the true bound; pin it
    assert(maxErr <= 520, s"max quantization error $maxErr")
    assert(maxErr >= 256, s"suspiciously small error $maxErr") // sanity
  }

  test("A-law uses all 256 codes and the array codec round-trips") {
    val codes = (-32768 to 32767).map(G711.linearToAlaw).toSet
    assert(codes.size == 256)
    val samples = Array(0, 1, -1, 100, -100, 5000, -5000, 32767, -32768)
    val dec = G711.decodeAlaw(G711.encodeAlaw(samples))
    samples.zip(dec).foreach { case (s, y) =>
      assert(math.abs(s - y) <= 520)
    }
  }
}
