package graft.ops

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("olsByGroup: exact fits, negative slope, truncation toward zero") {
    val df = Seq(
      // a: perfect slope 100/unit through the origin
      ("a", 100L, 0L), ("a", 101L, 100L), ("a", 102L, 200L),
      // b: slope −20/unit, intercept 300 at the group x-min
      ("b", 0L, 300L), ("b", 10L, 100L),
      // c: intercept −100/6 = −16.66… — truncates to −1666e−2,
      // where a flooring division would read −1667
      ("c", 0L, 0L), ("c", 1L, 0L), ("c", 2L, 100L),
      // d: single point — undefined fit, NULL not zero
      ("d", 5L, 42L)
    ).toDF("g", "x", "y")
    val out = Trend.olsByGroup(df, "g", "x", "y")
      .as[(String, Long, Option[Long], Option[Long])].collect().toList
    assert(out == List(
      ("a", 3L, Some(100000000000L), Some(0L)),
      ("b", 2L, Some(-20000000000L), Some(30000L)),
      ("c", 3L, Some(50000000000L), Some(-1666L)),
      ("d", 1L, None, None)))
  }

  test("olsByGroup plan: broadcast min-attach, no sort-merge join, no window") {
    val df = (1L to 1000L).map(i => (s"g${i % 4}", i, i * 3)).toDF("g", "x", "y")
    val plan = Trend.olsByGroup(df, "g", "x", "y")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("olsByGroup: constant x with n>1 is NULL, x-shift only moves the intercept") {
    val df = Seq(
      ("e", 7L, 1L), ("e", 7L, 99L),
      ("f", 1000L, 10L), ("f", 1001L, 30L)
    ).toDF("g", "x", "y")
    val out = Trend.olsByGroup(df, "g", "x", "y")
      .as[(String, Long, Option[Long], Option[Long])].collect().toList
    // f is y = 10 + 20·(x − 1000): centering reads the intercept at
    // the group's own x-min, immune to the epoch magnitude
    assert(out == List(
      ("e", 2L, None, None),
      ("f", 2L, Some(20000000000L), Some(1000L))))
  }
}
