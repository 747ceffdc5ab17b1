package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: contingency + BigInt χ² over the
    * bigram stream, from first principles.
    */
  private def refChi2(texts: Seq[String], w1: String, w2: String): Long = {
    val bgs = texts.flatMap(t => t.split(" ").sliding(2).map(_.toSeq).toSeq)
      .filter(_.size == 2)
    val n = BigInt(bgs.size)
    val a = BigInt(bgs.count(b => b.head == w1 && b(1) == w2))
    val n1 = BigInt(bgs.count(_.head == w1))
    val n2 = BigInt(bgs.count(_(1) == w2))
    val b = n1 - a; val c = n2 - a; val d = n - n1 - n2 + a
    val num = n * (a * d - b * c) * (a * d - b * c)
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    (num / den).toLong
  }

  test("the planted collocation wins with the hand-computed chi2") {
    val texts =
      (0 until 30).map(i => s"new york f$i g${i % 7} h${i % 5}") ++
        (0 until 30).map(i => s"g${i % 7} x$i new h${i % 5} york q$i")
    val out = Collocations.topByChi2(texts.toDF("text"), "text",
        minCount = 5, k = 5)
      .as[(String, String, Long, Long)].collect().toList
    assert(out.head._1 == "new" && out.head._2 == "york")
    assert(out.head._3 == 30L)
    assert(out.head._4 == refChi2(texts, "new", "york"))
  }

  test("single-token docs contribute no bigrams; degenerate marginals read NULL") {
    val texts = Seq("solo", "a b", "a b") ++ Seq.fill(5)("a b")
    val out = Collocations.topByChi2(texts.toDF("text"), "text",
        minCount = 5, k = 5)
      .as[(String, String, Long, Option[Long])].collect().toList
    // "solo" adds nothing; the all-identical bigram corpus has a
    // zero marginal — the guard emits NULL, not an error
    assert(out == List(("a", "b", 7L, None)))
  }
}
