package graft.multimodal

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DctSpec extends SparkSpec {
  import spark.implicits._

  private def randomBlock(seed: Int): Array[Long] = {
    val rnd = new Random(seed)
    Array.fill(64)(rnd.nextInt(256).toLong)
  }

  test("kernel round trip equals the relational form, all qualities") {
    val blocks = (0 until 6).map(i => (i.toLong, randomBlock(i).toSeq))
    val pixels = blocks.flatMap { case (b, px) =>
      px.zipWithIndex.map { case (p, i) =>
        (b, (i / 8).toLong, (i % 8).toLong, p)
      }
    }.toDF("b", "x", "y", "p")
    for (q <- Seq(10, 50, 90)) {
      val rel = Dct.roundTripRelational(pixels, "b", q)
        .select($"b", $"x" * 8 + $"y", $"p2")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (b, rs) =>
          b -> rs.sortBy(_._2).map(_._3).toSeq
        }
      val kern = blocks.map { case (b, px) =>
        b -> Dct.roundTripBlock(px.toArray, q)._1.toSeq
      }.toMap
      assert(rel == kern, s"quality $q")
    }
  }

  test("a flat 128 block is lossless at any quality with zero codes") {
    for (q <- Seq(5, 50, 95)) {
      val (out, nnz) = Dct.roundTripBlock(Array.fill(64)(128L), q)
      assert(nnz == 0)
      assert(out.toSeq == Seq.fill(64)(128L), s"q=$q")
    }
  }

  test("flat non-128 blocks reconstruct within the DC quantization bound") {
    // only the DC coefficient survives; its quantization step q_dc
    // bounds the flat-field error by ~q_dc/16 pixels (+1 rounding)
    for (q <- Seq(5, 50, 95); v <- Seq(0L, 255L)) {
      val qdc = Dct.quantStep(0, 0, q)
      val (out, _) = Dct.roundTripBlock(Array.fill(64)(v), q)
      val err = out.map(p => math.abs(p - v)).max
      assert(err <= qdc / 16 + 1, s"q=$q v=$v err=$err qdc=$qdc")
      assert(out.distinct.length == 1, "flat in, flat out")
    }
  }

  test("distortion falls and code density rises with quality") {
    val px = randomBlock(42)
    def stats(q: Int) = {
      val (out, nnz) = Dct.roundTripBlock(px, q)
      val sse = (0 until 64).map(i => {
        val e = out(i) - px(i); e * e
      }).sum
      (sse, nnz)
    }
    val (s10, n10) = stats(10)
    val (s50, n50) = stats(50)
    val (s90, n90) = stats(90)
    assert(s10 >= s50 && s50 >= s90, s"sse $s10 $s50 $s90")
    assert(n10 <= n50 && n50 <= n90, s"nnz $n10 $n50 $n90")
    assert(s90 < s10, "quality must actually buy fidelity on a textured block")
  }

  test("size model: flat 128 block codes to exactly DC-zero + EOB = 8 bits") {
    for (q <- Seq(10, 50, 90)) {
      val (bits, nnz) = Dct.sizeBlock(Array.fill(64)(128L), q)
      assert(bits == 8L && nnz == 0, s"q=$q bits=$bits nnz=$nnz")
    }
  }

  test("size model: bits and nonzero AC codes grow with quality on texture") {
    val px = randomBlock(11)
    val readings = Seq(10, 50, 90).map(q => Dct.sizeBlock(px, q))
    assert(readings.map(_._1) == readings.map(_._1).sorted,
      s"bits not monotone: $readings")
    assert(readings.map(_._2) == readings.map(_._2).sorted,
      s"nnz not monotone: $readings")
    assert(readings.last._1 > readings.head._1,
      "quality must actually cost bits on a textured block")
  }

  test("size model: zigzag is a permutation of 0..63") {
    assert(Dct.Zigzag.sorted.toSeq == (0 until 64))
    // spot-pin the standard walk's first diagonal
    assert(Dct.Zigzag.take(6).toSeq == Seq(0, 1, 8, 16, 9, 2))
  }

  test("reconstruction is always clamped to 0..255") {
    val extreme = Array.tabulate(64)(i => if (i % 2 == 0) 0L else 255L)
    for (q <- Seq(5, 50, 95)) {
      val (out, _) = Dct.roundTripBlock(extreme, q)
      assert(out.forall(p => p >= 0L && p <= 255L), s"q=$q")
    }
  }

  test("high quality is near-lossless on smooth gradients") {
    val grad = Array.tabulate(64)(i => (40L + 2L * (i / 8) + (i % 8)))
    val (out, _) = Dct.roundTripBlock(grad, 95)
    val maxErr = (0 until 64).map(i => math.abs(out(i) - grad(i))).max
    assert(maxErr <= 2L, s"maxErr=$maxErr")
  }
}
