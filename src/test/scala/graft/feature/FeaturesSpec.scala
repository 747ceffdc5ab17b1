package graft.feature

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    ("u1", Seq("a", "a", "b")),
    ("u2", Seq("b", "c")),
    ("u3", Seq("c", "c", "c", "d"))
  ).toDF("user", "toks")

  test("termFreq counts per (entity, term)") {
    val tf = Features.termFreq(docs, "user", "toks")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(tf(("u1", "a")) == 2L)
    assert(tf(("u3", "c")) == 3L)
    assert(tf.size == 6)
  }

  test("idf uses the smoothed ln((N+1)/(df+1)) formula") {
    val tf = Features.termFreq(docs, "user", "toks")
    val i = Features.idf(tf, "user", nEntities = 3)
      .select("term", "idf").as[(String, Double)].collect().toMap
    assert(math.abs(i("a") - math.log(4.0 / 2.0)) < 1e-9) // df=1
    assert(math.abs(i("b") - math.log(4.0 / 3.0)) < 1e-9) // df=2
  }

  test("normalizedTfidfTags scores in [0,1] and caps per entity") {
    val out = Features.normalizedTfidfTags(docs, "user", "toks", k = 2)
      .as[(String, String, Double)].collect()
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    // u1's top tag is 'a' (highest tf, rarest term)
    assert(out.filter(_._1 == "u1").maxBy(_._3)._2 == "a")
  }

  test("vocabulary assigns contiguous sorted 1-based ids") {
    val tf = Features.termFreq(docs, "user", "toks")
    val v = Features.vocabulary(tf)
      .as[(String, Long)].collect().sortBy(_._2)
    assert(v.map(_._1).toSeq == Seq("a", "b", "c", "d"))
    assert(v.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("libsvmLines orders features by wid") {
    val lines = Features.libsvmLines(docs, "user", "toks")
      .select("did", "line").as[(String, String)].collect().toMap
    assert(lines("u1") == "u1 1:2 2:1")     // a(wid1):2 b(wid2):1
    assert(lines("u3") == "u3 3:3 4:1")     // c(wid3):3 d(wid4):1
  }
}
