package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target-flavored docs share a vocabulary; raw noise docs don't
  private def docs = Seq(
    (1L, "spark shuffle join spark scan", "t"),
    (2L, "spark join scan shuffle plan", "t"),
    (3L, "banana apple cherry fruit salad", "r"),
    (4L, "violin cello oboe quartet", "r"),
    (5L, "spark scan plan shuffle join", "r") // target-like but raw
  ).toDF("id", "text", "kind")

  private def scores = Dsir.importanceScores(
    docs, "id", "text", col("kind") === "t", buckets = 256)
    .as[(Long, Long)].collect().toMap

  test("target-like docs score above off-target docs") {
    val s = scores
    assert(s.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // the raw doc written in the target vocabulary outranks the
    // fruit/music docs — the whole point of importance weighting
    assert(s(5L) > s(3L), s"target-like ${s(5L)} !> fruit ${s(3L)}")
    assert(s(5L) > s(4L), s"target-like ${s(5L)} !> music ${s(4L)}")
    assert(s(1L) > s(3L) && s(2L) > s(4L))
  }

  test("scores are exact integers, deterministic across runs") {
    assert(scores == scores)
  }

  test("logRatioWeights: unseen-in-target buckets weigh negative") {
    val w = Dsir.logRatioWeights(docs, "id",
      graft.text.TextFunctions.tokens(col("text")),
      col("kind") === "t", buckets = 256)
      .as[(Long, Long)].collect().toMap
    assert(w.nonEmpty)
    // grams only in raw docs → p̂ < q̂ → negative log-ratio; grams
    // concentrated in target → positive
    assert(w.values.exists(_ < 0) && w.values.exists(_ > 0))
  }

  test("gumbelTopK selects k rows deterministically, keys are stable") {
    val sc = Dsir.importanceScores(
      docs, "id", "text", col("kind") === "t", buckets = 256)
    def run() = Dsir.gumbelTopK(sc, "id", 3)
      .select("id").as[Long].collect().toSeq
    val a = run()
    assert(a.length == 3 && a.distinct.length == 3)
    assert(a == run())
  }

  test("importanceScores plans a broadcast of the weight table") {
    val plan = Dsir.importanceScores(
      docs, "id", "text", col("kind") === "t", buckets = 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"weight table must broadcast, not shuffle the gram stream:\n$plan")
  }
}
