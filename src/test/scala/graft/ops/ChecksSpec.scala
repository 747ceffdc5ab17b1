package graft.ops

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(Option[Long], String, Double)](
    (Some(1L), "A", 1.0), (Some(2L), "N", 2.5),
    (Some(2L), "R", 49.99), (None, "X", 0.5))
    .toDF("k", "flag", "v")

  test("evaluate: one verdict row per rule, exact measurements, honest fails") {
    val out = Checks.evaluate(df, Seq(
      Checks.Rule("complete_k", Checks.nullCount("k"), 0, 0),
      Checks.Rule("domain_flag",
        Checks.outOfDomain("flag", Seq("A", "N", "R")), 0, 0),
      Checks.Rule("v_min_fx", Checks.minFx("v"), 100, 5000),
      Checks.Rule("v_max_fx", Checks.maxFx("v"), 100, 5000),
      Checks.Rule("unique_k", Checks.duplicateCount(Seq("k")), 0, 0)))
      .as[(String, Long, Long, Long, Boolean)].collect().toList
    assert(out == List(
      ("complete_k", 1L, 0L, 0L, false),   // one null
      ("domain_flag", 1L, 0L, 0L, false),  // 'X'
      ("unique_k", 1L, 0L, 0L, false),     // k=2 twice (null not counted)
      ("v_max_fx", 4999L, 100L, 5000L, true),
      ("v_min_fx", 50L, 100L, 5000L, false))) // 0.5 below the floor
  }

  test("evaluate is one scan: single aggregate, no join") {
    val plan = Checks.evaluate(df, Seq(
      Checks.Rule("a", Checks.nullCount("k"), 0, 0),
      Checks.Rule("b", Checks.maxFx("v"), 0, 100)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
  }
}
