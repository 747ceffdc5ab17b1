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
}
