package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.feature.Features

/** Round-5 curation operators: exact-substring duplicate spans,
  * cross-corpus LSH decontamination, temperature mixing, and the
  * fixed-weight linear quality score.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, seed: String) =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  test("duplicateSpans: shared 13-token windows found, unique text clean") {
    val shared = words(20, "s") // 20 tokens -> 8 shared windows inside
    val docs = Seq(
      (1L, words(15, "a") + " " + shared),
      (2L, shared + " " + words(15, "b")),
      (3L, words(40, "c"))).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", n = 13)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc 3 shares nothing -> absent
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    val Seq(d1, d2) = out.toSeq
    // 35 tokens -> 23 windows each; the 8 windows fully inside the
    // shared 20 tokens are duplicated in both docs
    assert(d1._2 == 23 && d2._2 == 23)
    assert(d1._3 == 8 && d2._3 == 8)
    assert(d1._4 == math.rint(8.0 / 23.0 * 10000) / 10000)
  }

  test("duplicateSpans: within-doc repetition alone is not a dup span") {
    val rep = words(13, "r")
    val docs = Seq((1L, rep + " " + rep)).toDF("doc_id", "text")
    // every window occurs in exactly one (this) doc
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", 13).count() == 0)
  }

  test("lshCandidatesAcross: contaminated copy flagged, unrelated not") {
    val bench = Seq((100L, words(30, "w"))).toDF("doc_id", "text")
    val train = Seq(
      (1L, words(30, "w") + " tail0 tail1"), // near-copy of bench 100
      (2L, words(30, "z"))                   // unrelated
    ).toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatesAcross(train, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 100L)))
    assert(!pairs.exists(_._1 == 2L))
  }

  test("temperatureSample: sqrt weighting, budget honored, deterministic") {
    val docs = (1L to 1000L)
      .map(i => (i, if (i <= 900) "big" else "small", s"text of $i"))
      .toDF("doc_id", "lang", "text")
    val sel = Pipelines.temperatureSample(docs, "lang", "doc_id", "text",
      budget = 100L)
    val byLang = sel.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    // weights 30:10 -> targets 75:25 (vs 90:10 proportional — the
    // small class is up-weighted, the big one capped)
    assert(byLang == Map("big" -> 75L, "small" -> 25L))
    // deterministic under repartitioning
    val again = Pipelines.temperatureSample(docs.repartition(7), "lang",
      "doc_id", "text", budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sel.select("doc_id").as[Long].collect().toSet)
  }

  test("duplicateSpans plans one scan, no join, two key shuffles") {
    val docs = Seq((1L, words(40, "a"))).toDF("doc_id", "text")
    val plan = Dedup.duplicateSpans(docs, "doc_id", "text", 13)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"span dedup must not join (the count-distinct+join form rescans):\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      "nothing to broadcast — a per-digest map cannot broadcast at scale")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 2,
      s"expected ONE digest shuffle (shared by agg + window) + doc agg, got $shuffles:\n$plan")
  }

  test("int8Quantize: codes span 0..255, constant vector all-zero") {
    val df = Seq(
      (1L, Seq(0.0f, 1.0f, 0.5f)),
      (2L, Seq(2.0f, 2.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = df.select($"vec_id",
        graft.similarity.Ann.int8Quantize($"embedding").as("z"))
      .select($"vec_id", $"z.mn", $"z.mx", $"z.q")
      .as[(Long, Double, Double, Seq[Long])].collect().sortBy(_._1)
    val (_, mn, mx, q) = out(0)
    assert(mn == 0.0 && mx == 1.0)
    assert(q == Seq(0L, 255L, 128L)) // 0.5 -> floor(127.5 + 0.5)
    assert(out(1)._4 == Seq(0L, 0L, 0L)) // scale 0: all-zero codes
    // reconstruction error bounded by scale/2
    val err = math.abs(0.5 - 128 * (1.0 / 255.0))
    assert(err <= (1.0 / 255.0) / 2 + 1e-12)
  }

  test("taggedNgramsFast equals per-size ngrams composition") {
    import graft.text.{TextFunctions => T}
    val df = Seq((1L, "a b c d e"), (2L, "x y"), (3L, "z"),
      (4L, null: String)).toDF("doc_id", "text")
    val toks = T.tokens($"text")
    val kernel = df.select($"doc_id", explode(T.taggedNgramsFast(toks, 2, 4))
        .as("ng"))
      .select($"doc_id", $"ng._1".as("n"), $"ng._2".as("g"))
      .as[(Long, Int, String)].collect().toSet
    val composed = (2 to 4).flatMap { n =>
      df.select($"doc_id", lit(n).as("n"), explode(T.ngramsFast(toks, n))
          .as("g"))
        .as[(Long, Int, String)].collect()
    }.toSet
    assert(kernel == composed)
    assert(kernel.exists(_ == (1L, 4, "a b c d")))
    assert(!kernel.exists(_._1 >= 3L)) // too short / null: no grams
  }

  test("edge cases: nulls, short docs, empty benchmark, single class") {
    // null text and sub-n docs contribute no windows and never crash
    val docs = Seq((1L, null: String), (2L, "tiny doc"),
      (3L, words(40, "x"))).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", 13).count() == 0)
    // empty benchmark side: no candidates, not an error
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.lshCandidatesAcross(docs.filter($"text".isNotNull), none,
      "doc_id", "text").count() == 0)
    // single-class temperature mix degenerates to a plain cap
    val one = (1L to 50L).map(i => (i, "only", s"t $i"))
      .toDF("doc_id", "lang", "text")
    val sel = Pipelines.temperatureSample(one, "lang", "doc_id", "text", 10L)
    assert(sel.count() == 10)
  }

  test("linearQualityScore: monotone in length, penalized by digits") {
    val docs = Seq(
      (1L, "the " + words(400, "tok")),    // long, has a stopword
      (2L, "x1 22 333"),                   // short, digit-heavy
      (3L, words(10, "y"))                 // short, clean
    ).toDF("doc_id", "text")
    val scored = docs.select($"doc_id",
      Features.linearQualityScore($"text",
        graft.text.TextFunctions.tokens($"text")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scored(1L) > scored(3L)) // length credit
    assert(scored(2L) < scored(3L)) // digit penalty
    assert(scored.values.forall(s => s > -0.6 && s < 1.4))
  }
}
