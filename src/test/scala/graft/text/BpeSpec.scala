package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordCounts aggregates corpus frequencies, drops 1-char words") {
    val docs = Seq((1L, "ab ab c abc"), (2L, "ab x yz")).toDF("id", "text")
    val wc = Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(wc == Map("ab" -> 3L, "abc" -> 1L, "yz" -> 1L))
  }

  test("pairCounts weights each adjacent pair by word frequency") {
    val words = Seq(("ab", 3L), ("abc", 1L), ("yz", 1L)).toDF("w", "freq")
    val pc = Bpe.pairCounts(words).as[(String, Long)].collect().toMap
    // "ab" from 'ab'×3 and 'abc'×1; "bc" from 'abc'×1; "yz" from 'yz'×1
    assert(pc == Map("ab" -> 4L, "bc" -> 1L, "yz" -> 1L))
  }

  test("pair counting over distinct words equals counting over raw tokens") {
    val docs = Seq((1L, "spark spark scale merge"), (2L, "spark merge"))
      .toDF("id", "text")
    val viaVocab = Bpe.pairCounts(Bpe.wordCounts(docs, "text"))
      .as[(String, Long)].collect().toMap
    // brute force: pairs from every token occurrence
    val brute = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" "))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    assert(viaVocab == brute)
  }
}
