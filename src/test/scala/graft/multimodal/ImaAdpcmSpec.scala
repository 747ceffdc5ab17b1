package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ImaAdpcmSpec extends AnyFunSuite {

  // triangle wave: slope 200/sample inside ±8000 — a trackable
  // signal (per-sample delta well inside the adapted step range)
  private def triangle(n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var v = 0; var d = 200; var i = 0
    while (i < n) {
      out(i) = v; v += d
      if (v >= 8000 || v <= -8000) d = -d
      i += 1
    }
    out
  }

  test("codes are 4-bit; decode is a pure function of the code stream") {
    val x = triangle(500)
    val codes = ImaAdpcm.encode(x)
    assert(codes.forall(c => c >= 0 && c <= 15))
    val y1 = ImaAdpcm.decode(codes)
    val y2 = ImaAdpcm.decode(codes.clone())
    assert(y1.sameElements(y2))
  }

  test("trackable signal reconstructs tightly once the step adapts") {
    // measured: max error 560 during the first-sample jump-in, 31
    // after 20 samples of adaptation; bands leave ~2x headroom
    val x = triangle(2000)
    val y = ImaAdpcm.decode(ImaAdpcm.encode(x))
    val errs = x.zip(y).map { case (a, b) => math.abs(a - b) }
    assert(errs.max <= 1200, s"cold max ${errs.max}")
    assert(errs.drop(20).max <= 64, s"adapted max ${errs.drop(20).max}")
  }

  test("extreme constant input clamps cleanly and converges; silence decodes to silence") {
    val up = ImaAdpcm.decode(ImaAdpcm.encode(Array.fill(100)(32767)))
    assert(up.forall(v => v >= -32768 && v <= 32767))
    assert(up.last == 32767, s"converged to ${up.last}")
    val dn = ImaAdpcm.decode(ImaAdpcm.encode(Array.fill(100)(-32768)))
    assert(dn.forall(v => v >= -32768 && v <= 32767))
    assert(dn.last <= -32700, s"converged to ${dn.last}")
    val z = ImaAdpcm.decode(ImaAdpcm.encode(Array.fill(50)(0)))
    assert(z.forall(_ == 0))
  }

  test("encoder mirrors the decoder: unsaturated samples land within one step") {
    // the IMA invariant: when the magnitude bits do NOT saturate
    // (delta&7 < 7 — the quantizer captured the whole difference),
    // the reconstruction lands within the step in force for that
    // sample. Saturated samples are slewing (the signal outran the
    // adapted step) and carry no per-sample bound — that phase is
    // what the index walk exists to exit.
    val x = triangle(2000)
    val codes = ImaAdpcm.encode(x)
    val y = ImaAdpcm.decode(codes)
    // replay the index walk to know each sample's step
    var idx = 0
    var i = 0
    var unsaturated = 0
    while (i < x.length) {
      val step = ImaAdpcm.StepTable(idx)
      if ((codes(i) & 7) < 7) {
        unsaturated += 1
        assert(math.abs(x(i) - y(i)) <= step,
          s"sample $i: err ${math.abs(x(i) - y(i))} > step $step")
      }
      idx = math.max(0, math.min(88,
        idx + ImaAdpcm.IndexTable(codes(i) & 7)))
      i += 1
    }
    assert(unsaturated > 1500, s"only $unsaturated unsaturated samples")
  }
}
