package graft.io

import graft.SparkSpec

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Reference xy→d (Wikipedia's standard iterative form). */
  private def refD(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("expression chain matches the reference walk at bits=16") {
    val pts = (for (a <- 0L to 63L; b <- 0L to 63L) yield (a, b)) ++
      Seq((65535L, 65535L), (0L, 65535L), (65535L, 0L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .transform(Hilbert.withHilbertIndexExpr(_, "x", "y", "h"))
      .select($"x", $"y", $"h").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == refD(16, x, y), s"($x, $y)")
    }
  }

  test("kernel form is bit-equal to the expression chain") {
    val pts = (for (a <- 0L to 63L; b <- 0L to 63L)
      yield (a * 997 % 65536, b * 1013 % 65536)) ++
      Seq((65535L, 65535L), (0L, 0L))
    val df = pts.toDF("x", "y")
    val kernel = Hilbert.withHilbertIndex(df, "x", "y", "h")
      .select($"x", $"y", $"h").as[(Long, Long, Long)].collect().toSet
    val chain = Hilbert.withHilbertIndexExpr(df, "x", "y", "h")
      .select($"x", $"y", $"h").as[(Long, Long, Long)].collect().toSet
    assert(kernel == chain)
  }

  test("bits=5 grid: bijection onto 0..1023 and one grid step per index step") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val walk = Hilbert.withHilbertIndex(grid, "x", "y", "h", bits = 5)
      .select($"h", $"x", $"y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(walk.map(_._1).toList == (0L until 1024L).toList)
    // THE Hilbert property (and what Morton lacks): consecutive
    // indices are Manhattan-distance-1 neighbors — no diagonal jumps
    walk.sliding(2).foreach {
      case Array((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
          s"jump from ($x1,$y1) to ($x2,$y2)")
      case _ =>
    }
  }

  test("tighter files than Morton: lower mean span at the same file count") {
    val grid = (for (a <- 0L until 128L; b <- 0L until 128L)
      yield (a, b)).toDF("a", "b")
    def meanSpan(stats: Array[(Long, Long, Long, Long, Long, Long, Long, Long)]) =
      stats.map(r => r._7 + r._8).sum.toDouble / stats.length
    val h = Hilbert.fileStats(grid, "a", "b", shift = 24)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    val m = Zorder.fileStats(grid, "a", "b", shift = 24)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    // same number of rows, same total, comparable file counts
    assert(h.map(_._2).sum == m.map(_._2).sum)
    assert(meanSpan(h) <= meanSpan(m),
      s"hilbert ${meanSpan(h)} vs morton ${meanSpan(m)}")
  }
}
