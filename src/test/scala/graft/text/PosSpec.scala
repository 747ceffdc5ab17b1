package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PosSpec extends SparkSpec {
  import spark.implicits._

  test("posTag suffix heuristics") {
    val out = Seq("quickly", "running", "jumped", "famous", "helpful",
      "table", "the", "festival").toDF("t")
      .select(Pos.posTag(col("t")).as("tag")).as[String].collect().toSeq
    assert(out == Seq("RB", "VB", "VB", "JJ", "JJ", "NN", "OT", "JJ"))
  }

  test("filteredTokens keeps NN/JJ/VB, drops stopwords and adverbs") {
    val out = Seq(Tuple1(Seq("the", "running", "dog", "quickly", "famous")))
      .toDF("toks")
      .select(Pos.filteredTokens(col("toks")).as("k"))
      .as[Seq[String]].head()
    assert(out == Seq("running", "dog", "famous"))
  }

  test("patternBigrams keeps allowed tag pairs only") {
    // tags: famous=JJ dog=NN barked=VB loudly=RB
    val out = Seq(Tuple1(Seq("famous", "dog", "barked", "loudly")))
      .toDF("toks")
      .select(Pos.patternBigrams(col("toks")).as("b"))
      .as[Seq[String]].head()
    // JJ-NN ok, NN-VB ok, VB-RB not a pattern
    assert(out == Seq("famous dog", "dog barked"))
  }

  test("patternBigrams on short arrays is empty") {
    val out = Seq(Tuple1(Seq("dog"))).toDF("toks")
      .select(Pos.patternBigrams(col("toks")).as("b"))
      .as[Seq[String]].head()
    assert(out.isEmpty)
  }

  test("patternBigramsFast kernel matches the expression form") {
    val samples = Seq(
      Seq("famous", "dog", "barked", "loudly"),
      Seq("the", "running", "dog", "chased", "a", "helpful", "cat"),
      Seq("dog"),
      Seq.empty[String],
      Seq("quickly", "quickly"),
      Seq("table", "festival", "running", "jumped", "famous", "the"))
    samples.foreach { toks =>
      val both = Seq(Tuple1(toks)).toDF("toks")
        .select(Pos.patternBigrams(col("toks")).as("expr"),
          Pos.patternBigramsFast(col("toks")).as("fast"))
        .as[(Seq[String], Seq[String])].head()
      assert(both._1 == both._2, s"toks=$toks")
    }
  }
}
