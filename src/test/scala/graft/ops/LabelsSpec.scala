package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LabelsSpec extends SparkSpec {
  import spark.implicits._

  test("mapLookup maps codes and defaults unknown") {
    val out = Seq(0, 1, 9).toDF("code")
      .select(Labels.mapLookup(col("code"),
        Map(0 -> "zero", 1 -> "one")).as("name"))
      .as[String].collect().toSeq
    assert(out == Seq("zero", "one", "unknown"))
  }

  test("canonicalize lowercases, trims, applies ordered replacements") {
    val out = Seq("  Src1-News  ").toDF("raw")
      .select(Labels.canonicalize(col("raw"),
        Seq("src1" -> "alpha", "-news" -> "")).as("c"))
      .as[String].head()
    assert(out == "alpha")
  }

  test("longestMatch drops keywords contained in longer ones") {
    val out = Seq(Seq("spark", "spark engine", "engine", "disk"))
      .toDF("kw")
      .select(array_sort(Labels.longestMatch(col("kw"))).as("kept"))
      .as[Seq[String]].head()
    assert(out == Seq("disk", "spark engine"))
  }

  test("combine full-outer-joins label sets with product rescoring") {
    val a = Seq((1L, "x", 2.0), (1L, "y", 3.0)).toDF("id", "label", "score")
    val b = Seq((1L, "x", 0.5), (1L, "z", 4.0)).toDF("id", "label", "score")
    val out = Labels.combine(a, b, "id", "label", "score", k = 3)
      .select("label", "score").as[(String, Double)].collect().toMap
    assert(out == Map("x" -> 1.0, "y" -> 3.0, "z" -> 4.0))
  }

  test("confidenceClean drops weak agreements and confident disagreements") {
    val df = Seq(
      (1L, 1, 1, 0.2),  // agree, low proba → drop
      (2L, 1, 1, 0.9),  // agree, high proba → keep
      (3L, 1, 2, 0.9),  // disagree, high proba → drop
      (4L, 1, 2, 0.5)   // disagree, mid proba → keep
    ).toDF("id", "label", "predict", "proba")
    val kept = Labels.confidenceClean(df, "label", "predict", "proba",
      lowT = 0.3, highT = 0.7).select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("confidenceRelabel adopts confident disagreements only") {
    val df = Seq(
      (1L, 1, 2, 0.9),  // relabeled to 2
      (2L, 1, 2, 0.5),  // kept 1
      (3L, 1, 1, 0.9)   // unchanged
    ).toDF("id", "label", "predict", "proba")
    val out = Labels.confidenceRelabel(df, "label", "predict", "proba", 0.7)
      .select("id", "label").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2, 2L -> 1, 3L -> 1))
  }
}
