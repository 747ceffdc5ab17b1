package graft.ops

import graft.SparkSpec

class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[String]) =
    Concentration.concentration(rows.toDF("g"), "g")
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("uniform shares: max entropy, zero gini, 1/G top share") {
    val out = run(Seq.fill(6)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(6)("c") ++ Seq.fill(6)("d"))
    val perTerm = math.floor(1e6 * 0.25 * math.log(4.0)).toLong
    assert(out == ((4L, 24L, 4 * perTerm, 0L, 250000L)))
  }

  test("single group: zero entropy, zero gini, full top share") {
    assert(run(Seq.fill(9)("only")) == ((1L, 9L, 0L, 0L, 1000000L)))
  }

  test("skewed shares: hand-computed entropy and gini") {
    // {a:1, b:3}: H = .25·ln4 + .75·ln(4/3) per-term-floored;
    // gini ranks a=1, b=2 -> (2·(1+6) − 3·4) / (2·4) = 0.25
    val out = run(Seq("a") ++ Seq.fill(3)("b"))
    val h = math.floor(1e6 * 0.25 * math.log(4.0)).toLong +
      math.floor(1e6 * 0.75 * math.log(4.0 / 3.0)).toLong
    assert(out == ((2L, 4L, h, 250000L, 750000L)))
  }
}
