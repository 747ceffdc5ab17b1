package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("pctRankBanded equals the naive strict-below fraction, ties share") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L), (5L, 5L))
      .toDF("id", "v")
    val out = Ranks.pctRankBanded(df, "v", "pct")
      .select("id", "pct").as[(Long, Long)].collect().toMap
    // naive: floor(1e6 * (#strictly below) / 5)
    def f(below: Int) = math.floor(1e6 * below / 5L).toLong
    assert(out === Map(5L -> f(0), 1L -> f(1), 2L -> f(2), 3L -> f(2),
      4L -> f(4)))
  }

  test("property: pctRankBanded equals a scala-side strict-below oracle") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      k <- Gen.choose(1, 60)
      vs <- Gen.listOfN(k, Gen.choose(-50L, 50L))
    } yield vs
    val cases = (0 until 5).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(11L + i)))
    assert(cases.nonEmpty)
    cases.foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = Ranks.pctRankBanded(df, "v", "pct")
        .select("id", "pct").as[(Long, Long)].collect().toMap
      val n = vs.size.toLong
      vs.zipWithIndex.foreach { case (v, i) =>
        val below = vs.count(_ < v).toLong
        val want = math.floor(1e6 * below / n).toLong
        assert(got(i.toLong) == want, s"v=$v below=$below n=$n")
      }
    }
  }

  test("quantileGate: exact tie-stable gate, norm vs raw tell skew apart") {
    // A holds 1..10, B holds 101..110: within-group both keep their
    // top-2 (below·5 ≥ n·4 -> below ≥ 8); the raw global cutoff
    // (below ≥ 16) selects only B values.
    val rows = (1 to 10).map(v => ("A", v.toLong)) ++
      (1 to 10).map(v => ("B", 100L + v))
    val out = Ranks.quantileGate(rows.toDF("g", "v"), "g", "v", 4, 5)
      .orderBy("g").as[(String, Long, Long, Long)].collect().toList
    assert(out == List(("A", 10L, 2L, 0L), ("B", 10L, 2L, 4L)))
  }

  test("quantileGate ties pass or fail together; all-equal selects none") {
    // {1,1,1,1,2}: value 2 has below=4 -> 4·5=20 ≥ 4·5=20 passes;
    // the tied 1s have below=0 and fail together.
    val a = Seq.fill(4)(("t", 1L)) :+ (("t", 2L))
    val one = Ranks.quantileGate(a.toDF("g", "v"), "g", "v", 4, 5)
      .as[(String, Long, Long, Long)].collect().head
    assert(one == (("t", 5L, 1L, 1L)))
    val eq = Ranks.quantileGate(Seq.fill(8)(("e", 3L)).toDF("g", "v"),
      "g", "v", 4, 5).as[(String, Long, Long, Long)].collect().head
    assert(eq == (("e", 8L, 0L, 0L)))
  }

  test("pctRankBanded windows over the histogram, attaches by broadcast") {
    val df = spark.range(1000).select(col("id"),
      (col("id") % 7L).as("v"))
    val plan = Ranks.pctRankBanded(df, "v", "pct")
      .queryExecution.executedPlan.toString
    // one window only, and it consumes the aggregated histogram —
    // corpus rows rejoin through a broadcast, never through a sort
    assert("(?i)window".r.findAllIn(plan).size >= 1)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toSeq
    assert(windowSpecs.size == 1, s"expected 1 window spec: $windowSpecs")
    assert(!plan.toLowerCase.contains("sortmergejoin"))
  }
}
