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
