package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq("apple", "apple", "banana")),
    (2L, Seq("banana", "cherry")),
    (3L, Seq("cherry", "cherry", "cherry"))
  ).toDF("doc_id", "toks")

  test("tf, df and smoothed idf are exact") {
    val s = Tfidf.scores(corpus, "doc_id", "toks", roundTo = 6)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // apple: doc1 tf=2, df=1 → idf = ln(4/2)
    val (tfA, dfA, idfA) = s((1L, "apple"))
    assert(tfA == 2 && dfA == 1)
    assert(math.abs(idfA - math.log(4.0 / 2.0)) < 1e-5)
    // banana: df=2 → idf = ln(4/3)
    assert(math.abs(s((2L, "banana"))._3 - math.log(4.0 / 3.0)) < 1e-5)
  }

  test("topTerms ranks by tfidf desc with term tiebreak") {
    val top = Tfidf.topTerms(corpus, "doc_id", "toks", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(top(1L) == "apple")   // tf=2 × idf(df=1) beats banana
    assert(top(3L) == "cherry")
  }

  test("bm25TopK ranks matches, penalizes length, ignores non-matches") {
    val docs = Seq(
      (1L, "hash join hash join vector"), // dense and short
      (2L, "hash join aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk"),
      (3L, "no relevant terms at all in this document"),
      (4L, "vector")
    ).toDF("doc_id", "text")
    val q = Seq("hash", "join", "vector")
    val out = Tfidf.bm25TopK(docs, "doc_id", "text", q, k = 10)
      .as[(Long, Long)].collect()
    assert(out.head._1 == 1L)
    assert(!out.map(_._1).contains(3L)) // no query term → no score row
    val m = out.toMap
    // same matched terms, lower tf and longer doc → strictly lower
    assert(m(1L) > m(2L))
    // partition-count independence: fixed-point integer contributions
    // make the sum exact, so the ranking cannot wobble with layout
    val out2 = Tfidf.bm25TopK(docs.repartition(7), "doc_id", "text", q,
      k = 10).as[(Long, Long)].collect()
    assert(out.toSeq == out2.toSeq)
  }
}
