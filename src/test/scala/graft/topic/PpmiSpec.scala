package graft.topic

import graft.SparkSpec

class PpmiSpec extends SparkSpec {
  import spark.implicits._

  private def toks = graft.text.TextFunctions.tokens(
    org.apache.spark.sql.functions.col("text"))

  test("embed: hand-computed SPPMI on a two-word corpus") {
    // tokens [a b a b], window 1, both directions: (a,b)x3 + (b,a)x3
    // = 6 pairs; PMI(a,b) = ln(3*6/(3*3)) = ln 2 → 693147 at shift 1
    val docs = Seq("a b a b").toDF("text").select(toks.as("toks"))
    val emb = Ppmi.embed(docs, "toks", window = 1, shift = 1)
      .as[(String, String, Long)].collect().toSet
    assert(emb == Set(("a", "b", 693147L), ("b", "a", 693147L)))
  }

  test("embed: the shift suppresses weak associations to zero") {
    val docs = Seq("a b a b").toDF("text").select(toks.as("toks"))
    // shift 5 > ratio 2 → every SPPMI value clamps out
    assert(Ppmi.embed(docs, "toks", window = 1, shift = 5).count() == 0L)
  }

  test("similarPairs: words with identical contexts rank first at cosine ~1") {
    // 'a' and 'b' share exactly the contexts {x, y}; 'z' shares none
    val docs = Seq("x a y", "x b y", "z q z q z q z")
      .toDF("text").select(toks.as("toks"))
    val emb = Ppmi.embed(docs, "toks", window = 1, shift = 1)
    val top = Ppmi.similarPairs(emb, k = 5)
      .as[(String, String, Long)].collect().toList
    assert(top.head._1 == "a" && top.head._2 == "b")
    // identical sparse rows: cosine is 1 up to the floored sqrt ulp
    assert(top.head._3 >= 999998L && top.head._3 <= 1000000L)
  }

  test("embed survives docs shorter than the window offset") {
    val docs = Seq("solo", "a b").toDF("text").select(toks.as("toks"))
    // window 3 > both doc lengths - 1: offsets 2 and 3 emit nothing,
    // offset 1 pairs only (a, b)
    val emb = Ppmi.embed(docs, "toks", window = 3, shift = 1)
      .as[(String, String, Long)].collect().toSet
    // (a,b) and (b,a): n=1 each, N=2, nw=nc=1 → ln(1·2/(1·1)) = ln 2
    assert(emb == Set(("a", "b", 693147L), ("b", "a", 693147L)))
  }
}
