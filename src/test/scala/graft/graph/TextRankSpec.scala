package graft.graph

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    Tuple1(Seq("a", "b", "a", "c")),
    Tuple1(Seq("b", "a", "d"))
  ).toDF("toks")

  test("coocEdges: undirected distinct consecutive pairs, no self-loops") {
    val edges = TextRank.coocEdges(docs, "toks")
      .as[(String, String)].collect().toSet
    // pairs: (a,b),(b,a),(a,c),(b,a),(a,d) → undirected closure
    assert(edges == Set(
      ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("a", "d"), ("d", "a")))
  }

  test("pagerank: scores sum to ~1 and hub node ranks highest") {
    val scores = TextRank.wordScores(docs, "toks")
      .as[(String, Double)].collect().toMap
    assert(math.abs(scores.values.sum - 1.0) < 0.01)
    // 'a' neighbors everything → highest score
    assert(scores("a") > scores("b"))
    assert(scores("b") > scores("c") - 1e-9)
    assert(scores("c") == scores("d")) // symmetric leaves tie exactly
  }

  test("pagerank runs a bounded job count (no per-iteration barrier)") {
    // The power loop must stay ONE lazy chain: links materialization,
    // the rank computation, and the score-persist count — plus the
    // handful of jobs coocEdges' distinct needs. A regression to
    // per-iteration broadcast/checkpoint would add 2 jobs × 10
    // iterations and multiply scheduling latency under host load
    // (BENCH_r05's 24 s q66). Counted via listener, generous slack
    // for AQE's internal stages.
    val counter = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      TextRank.wordScores(docs, "toks").count()
      // listener events are async; small settle window
      Thread.sleep(500)
      val n = counter.jobs.get()
      assert(n <= 8, s"pagerank launched $n jobs — eager iteration crept back")
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("tolerance mode converges to the fixed-iteration scores") {
    val edges = TextRank.coocEdges(docs, "toks")
    // the reference's contract: pageRank(tol). A tight tol must land
    // on the same fixpoint a long fixed run reaches (the default
    // fixed-10 is NOT yet converged at 4 decimals on this star
    // fixture — its hub score is 0.4345 vs the 0.4797 fixpoint — so
    // the comparison target is fixed-50). Agreement within one
    // rounding step of roundTo=4.
    val conv = TextRank.pagerank(edges, iterations = 100, tol = 1e-6)
      .as[(String, Double)].collect().toMap
    val fixed = TextRank.pagerank(edges, iterations = 50)
      .as[(String, Double)].collect().toMap
    assert(conv.keySet == fixed.keySet)
    val maxDiff = conv.map { case (k, v) => math.abs(v - fixed(k)) }.max
    assert(maxDiff <= 2e-4, s"converged=$conv fixed=$fixed")
    // and the hub ordering the coarser contract cares about holds
    assert(conv("a") > conv("b") && conv("b") == conv("c"))
  }

  test("tolerance mode stops early: huge tol equals one iteration") {
    val edges = TextRank.coocEdges(docs, "toks")
    // any δ <= 1, so the loop must exit after exactly one round —
    // observable because the scores equal pagerank(iterations = 1)
    val one = TextRank.pagerank(edges, iterations = 1)
      .as[(String, Double)].collect().toMap
    val early = TextRank.pagerank(edges, iterations = 50, tol = 1.0)
      .as[(String, Double)].collect().toMap
    assert(early == one)
  }

  test("pagerank is deterministic across runs") {
    val a = TextRank.wordScores(docs, "toks").as[(String, Double)]
      .collect().toMap
    val b = TextRank.wordScores(docs, "toks").as[(String, Double)]
      .collect().toMap
    assert(a == b)
  }

  test("GraphX variant agrees with the DataFrame loop on ranking") {
    val df = TextRank.wordScores(docs, "toks")
      .as[(String, Double)].collect().toMap
    val gx = TextRank.wordScoresGraphX(docs, "toks")
      .as[(String, Double)].collect().toMap
    assert(gx.keySet == df.keySet)
    // same ranking: 'a' on top, symmetric b/c/d tied underneath
    assert(gx("a") > gx("b"))
    assert(math.abs(gx("b") - gx("c")) < 1e-9)
    assert(math.abs(gx("c") - gx("d")) < 1e-9)
    // scores land in the same normalized ballpark (sum ≈ 1)
    assert(math.abs(gx.values.sum - 1.0) < 0.1)
  }

  test("topPhrases scores distinct bigrams by summed node scores") {
    val withIds = Seq((1L, Seq("a", "b", "a", "c")))
      .toDF("id", "toks")
    val scores = TextRank.wordScores(docs, "toks")
    val out = TextRank.topPhrases(withIds, "id", "toks", scores, k = 2)
      .select("phrase", "score").as[(String, Double)].collect().toMap
    val s = scores.as[(String, Double)].collect().toMap
    // b and c are graph-symmetric → all phrases tie on s(a)+s(x);
    // the deterministic phrase-asc tiebreak keeps "a b", "a c"
    assert(out.keySet == Set("a b", "a c"))
    assert(out.values.forall(_ > 0))
    assert(math.abs(out("a b") - math.rint((s("a") + s("b")) * 10000) / 10000)
      < 1e-9)
  }
}
