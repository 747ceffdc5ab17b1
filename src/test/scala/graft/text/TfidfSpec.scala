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
}
