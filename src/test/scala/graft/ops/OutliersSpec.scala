package graft.ops

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]) =
    Outliers.robustOutliers(rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList

  test("hand-computed fences flag exactly the planted outliers") {
    // group a: fx 100..1200 (12 clean values) + two gross outliers.
    // n=14: Q1 = rank ceil(14/4)=4 -> 300, Q3 = rank ceil(42/4)=11
    // -> 1000 (ranks count the low outlier at rank 1), IQR=700,
    // fences [-750, 2050] -> only the planted +-10000 flag
    val clean = (1 to 12).map(i => ("a", i * 1.0))
    val out = run(clean ++ Seq(("a", -100.0), ("a", 100.0)))
    assert(out == List(("a", 14L, 300L, 1000L, 1L, 1L)))
  }

  test("no outliers in a tight cluster; per-group independence") {
    // group b is tight; group c is b's values scaled 100x (also
    // internally tight) - a global fence would flag all of c
    val rows = (1 to 20).map(i => ("b", 5.0 + (i % 3) * 0.01)) ++
      (1 to 20).map(i => ("c", 500.0 + (i % 3) * 1.0))
    val out = run(rows)
    assert(out.map(_._1) == List("b", "c"))
    out.foreach { r => assert(r._5 == 0L && r._6 == 0L, r) }
  }

  test("degenerate sizes: n=1 and n=2 never flag, quartiles defined") {
    val out = run(Seq(("x", 7.0), ("y", 1.0), ("y", 9.0)))
    // n=1: k25=k75=1 -> Q1=Q3=700, IQR=0, fences collapse to the value
    assert(out.find(_._1 == "x").get == (("x", 1L, 700L, 700L, 0L, 0L)))
    // n=2: k25=1, k75=2 -> Q1=100, Q3=900, IQR=800 -> fences [-1100, 2100]
    assert(out.find(_._1 == "y").get == (("y", 2L, 100L, 900L, 0L, 0L)))
  }

  test("duplicate values at the quartile rank are deterministic") {
    // ties straddling the quartile ranks: the rank-k VALUE is unique
    // regardless of row_number tie order
    val rows = Seq.fill(6)(("t", 2.0)) ++ Seq.fill(6)(("t", 8.0))
    val out = run(rows)
    // n=12: k25=3 -> 200, k75=9 -> 800
    assert(out == List(("t", 12L, 200L, 800L, 0L, 0L)))
  }
}
