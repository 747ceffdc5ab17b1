package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    "the spark shuffle moves rows between stages",
    "the spark join builds a hash table",
    "a shuffle join moves the hash table").toDF("text")

  private def docs = Seq(
    (1L, "the spark shuffle join moves rows"),   // target-like
    (2L, "banana oboe vermilion quux zephyr"),   // out of vocabulary
    (3L, "the spark"),                           // one bigram, in-LM
    (4L, "solo")                                 // no bigrams → no row
  ).toDF("id", "text")

  private def scores = NgramLm.perplexityScores(docs, "id", "text", target)
    .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("target-like text scores lower NLL than out-of-vocabulary text") {
    val s = scores
    assert(s(1L)._2 < s(2L)._2,
      s"in-domain ${s(1L)._2} should beat OOV ${s(2L)._2}")
  }

  test("bigram counts are right and no-bigram docs emit no row") {
    val s = scores
    assert(s.keySet == Set(1L, 2L, 3L))
    assert(s(1L)._1 == 5 && s(2L)._1 == 4 && s(3L)._1 == 1)
  }

  test("scores are exact integers, deterministic across runs") {
    assert(scores == scores)
  }

  test("a bigram seen in the LM outscores its smoothed-backoff floor") {
    // doc 3 is exactly one LM bigram ("the spark", c12=2, c1("the")=3):
    // p ≥ 0.9·(2/3) → nll_e6 ≤ floor(-1e6·ln(0.6)) = 510825
    assert(scores(3L)._2 <= 510826L, s"got ${scores(3L)._2}")
  }
}
