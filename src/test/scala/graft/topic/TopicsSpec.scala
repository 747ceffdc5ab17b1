package graft.topic

import graft.SparkSpec

class TopicsSpec extends SparkSpec {
  import spark.implicits._

  // Two clearly separable "topics": fruit docs and engine docs.
  private def docs = Seq(
    (1L, Seq("apple", "banana", "apple", "cherry")),
    (2L, Seq("banana", "apple", "banana")),
    (3L, Seq("shuffle", "join", "shuffle", "scan")),
    (4L, Seq("join", "scan", "shuffle"))
  ).toDF("id", "toks")

  test("ldaTopics returns k seeded topics over the vocabulary") {
    val topics = Topics.ldaTopics(docs, "toks", k = 2, maxIter = 20)
      .as[(Int, String, Double)].collect()
    assert(topics.length == 2)
    assert(topics.map(_._1).toSeq == Seq(0, 1))
    assert(topics.forall(_._3 > 0.0))
    val vocab = Set("apple", "banana", "cherry", "shuffle", "join", "scan")
    assert(topics.forall(_._2.split(",").forall(vocab.contains)))
  }

  test("ldaDominantTopic assigns every doc a topic in range") {
    val out = Topics.ldaDominantTopic(docs, "id", "toks", k = 2, maxIter = 20)
      .as[(Long, Int)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out.values.forall(t => t >= 0 && t < 2))
    // same-topic docs cluster together
    assert(out(1L) == out(2L))
    assert(out(3L) == out(4L))
  }

  test("ldaModelMetrics: online and em both converge with finite metrics") {
    for (opt <- Seq("online", "em")) {
      val row = Topics.ldaModelMetrics(docs, "toks", k = 2,
        optimizer = opt, maxIter = 20, vocabSize = 100)
        .as[(String, Int, Double, Double, Double)].collect()
      assert(row.length == 1)
      val (o, k, ll, lp, alpha) = row.head
      assert(o == opt && k == 2)
      // log likelihood of a discrete corpus is negative and finite;
      // perplexity = -ll/tokens is positive and finite.
      assert(!ll.isNaN && !ll.isInfinite && ll < 0.0, s"$opt ll=$ll")
      assert(!lp.isNaN && !lp.isInfinite && lp > 0.0, s"$opt lp=$lp")
      assert(alpha > 0.0)
    }
  }

  test("ldaModelMetrics metrics are seed-stable to fit noise") {
    // Online variational inference is seeded but not bit-stable
    // across fits (mini-batch sampling interacts with partition
    // layout), so assert the metrics land in a tight band rather
    // than exact equality — catches an ignored seed or divergence.
    def fit() = Topics.ldaModelMetrics(docs, "toks", k = 2,
      optimizer = "online", maxIter = 10, vocabSize = 100)
      .as[(String, Int, Double, Double, Double)].collect().head
    val (a, b) = (fit(), fit())
    assert(math.abs(a._3 - b._3) < 1.0, s"ll ${a._3} vs ${b._3}")
    assert(math.abs(a._4 - b._4) < 0.1, s"lp ${a._4} vs ${b._4}")
  }

  test("word2vec embeds every above-threshold word at the set dim") {
    val vecs = Topics.word2vec(docs, "toks", dim = 4, minCount = 2)
      .as[(String, org.apache.spark.ml.linalg.Vector)].collect().toMap
    // words with count >= 2: apple(3) banana(3) shuffle(3) join(2) scan(2)
    assert(vecs.keySet == Set("apple", "banana", "shuffle", "join", "scan"))
    assert(vecs.values.forall(_.size == 4))
  }

  test("word2vec: serialized fit reproduces exactly; default distributes") {
    def fit(parts: Int) =
      Topics.word2vec(docs, "toks", dim = 4, minCount = 2,
        numPartitions = parts)
        .as[(String, org.apache.spark.ml.linalg.Vector)].collect()
        .map { case (w, v) => (w, v.toArray.toSeq) }.toMap
    // numPartitions = 1 is the bit-reproducibility side of the trade
    assert(fit(1) == fit(1))
    // the engine default (0 → defaultParallelism) must still produce
    // a full vocabulary — the distributed fit is the corpus path
    assert(fit(0).keySet == fit(1).keySet)
  }
}
