package graft.ops

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact metrics on a fixture with nulls and dups") {
    val df = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(10.5)), (Some(1.0), Some(20.25)),
      (Some(2.5), None), (None, Some(10.5)), (Some(3.0), Some(0.0)))
      .toDF("a", "b")
    val rows = Profiler.profile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(rows == List(
      // col, n_rows, n_present, n_null, n_distinct, min_fx, max_fx
      ("a", 5L, 4L, 1L, 3L, 100L, 300L),
      ("b", 5L, 4L, 1L, 3L, 0L, 2025L)))
  }

  test("approxProfile agrees with exact on everything but distinct, which stays in band") {
    val df = (1L to 5000L).map(i => (i % 997 * 1.0, i * 0.01)).toDF("a", "b")
    val exact = Profiler.profile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Profiler.approxProfile(df, Seq("a", "b"), rsd = 0.02)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    approx.foreach { r =>
      val e = exact(r._1)
      assert((r._2, r._3, r._4, r._6, r._7) == (e._2, e._3, e._4, e._6, e._7))
      // HLL distinct within a generous multiple of the requested rsd
      assert(math.abs(r._5 - e._5).toDouble / e._5 <= 0.10,
        s"${r._1}: approx ${r._5} vs exact ${e._5}")
    }
  }

  test("histogramFx: exact integer binning, buckets partition the rows") {
    // fx values 0..999 uniform → 10 buckets of exactly 100
    val df = (0 until 1000).map(i => i / 100.0).toDF("v")
    val h = Profiler.histogramFx(df, "v", 10)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(h.map(_._1) == (0L to 9L).toList)
    assert(h.forall(_._2 == 100L))
    // bucket edges are contiguous and ordered in fx space
    h.sliding(2).foreach {
      case List(x, y) => assert(x._4 < y._3)
      case _ =>
    }
    assert(h.map(_._2).sum == 1000L)
  }

  test("histogramFx: degenerate single-value column lands in bucket 0") {
    val df = Seq(7.77, 7.77, 7.77).toDF("v")
    val h = Profiler.histogramFx(df, "v", 20)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(h == List((0L, 3L, 777L, 777L)))
  }

  test("profile is one scan: a single aggregate, no join in the plan") {
    val df = (1L to 100L).map(i => (i * 1.0, i * 2.0)).toDF("a", "b")
    val plan = Profiler.profile(df, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan.take(1200))
  }
}
