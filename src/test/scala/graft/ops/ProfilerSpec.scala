package graft.ops

import org.apache.spark.sql.functions.col

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

  test("chiSquareDrift: identical distributions score zero everywhere") {
    val df = (0 until 1000).map(i => (i % 100) / 10.0).toDF("v")
    val out = Profiler.chiSquareDrift(df, df, "v", 16)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out.nonEmpty)
    out.foreach { case (b, r, c, t) =>
      assert(b >= 0 && b <= 15)
      assert(r == c)
      assert(t == 0L, s"bucket $b term $t")
    }
    assert(out.map(_._2).sum == 1000L)
  }

  test("chiSquareDrift: shifted current mass concentrates in edge buckets") {
    val ref = (0 until 1000).map(i => (i % 100) / 1.0).toDF("v")
    // current sits entirely above the reference max → clamps into
    // bucket 15, the drift signature the gate must flag
    val cur = (0 until 500).map(_ => 500.0).toDF("v")
    val out = Profiler.chiSquareDrift(ref, cur, "v", 16)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out.forall(r => r._1 >= 0 && r._1 <= 15))
    val top = out.find(_._1 == 15L).get
    assert(top._3 == 500L)
    // its χ² term dominates every other bucket's
    assert(out.filter(_._1 != 15L).forall(_._4 < top._4))
    // and replays the documented smoothed formula exactly
    val (tr, tc) = (out.map(_._2).sum, out.map(_._3).sum)
    val pr = (top._2 + 1.0) / (tr + 16)
    val pc = (top._3 + 1.0) / (tc + 16)
    assert(top._4 ==
      math.floor((pc - pr) * (pc - pr) / pr * 1000000.0).toLong)
  }

  test("psiDrift: identical distributions score zero; shifted mass replays the formula") {
    val same = (0 until 1000).map(i => (i % 100) / 10.0).toDF("v")
    Profiler.psiDrift(same, same, "v", 16)
      .as[(Long, Long, Long, Long)].collect()
      .foreach { case (b, r, c, t) =>
        assert(r == c); assert(t == 0L, s"bucket $b term $t")
      }
    val ref = (0 until 1000).map(i => (i % 100) / 1.0).toDF("v")
    val cur = (0 until 500).map(_ => 500.0).toDF("v")
    val out = Profiler.psiDrift(ref, cur, "v", 16)
      .as[(Long, Long, Long, Long)].collect().toList
    // every PSI term is non-negative (both factors share a sign)
    assert(out.forall(_._4 >= 0L))
    val top = out.find(_._1 == 15L).get
    assert(top._3 == 500L)
    assert(out.filter(_._1 != 15L).forall(_._4 < top._4))
    // and replays the documented smoothed formula exactly
    val (tr, tc) = (out.map(_._2).sum, out.map(_._3).sum)
    val pr = (top._2 + 1.0) / (tr + 16)
    val pc = (top._3 + 1.0) / (tc + 16)
    assert(top._4 ==
      math.floor((pc - pr) * math.log(pc / pr) * 1000000.0).toLong)
    // the summed reading crosses the standard >0.25 'drifted' bar
    assert(out.map(_._4).sum > 250000L)
  }

  test("psiAgainst(referenceHistogram) equals the one-shot batch PSI") {
    val ref = (0 until 1000).map(i => (i % 100) / 1.0).toDF("v")
    val cur = ((0 until 200).map(_ => 12.5) ++
      (0 until 100).map(_ => 500.0)).toDF("v")
    val batch = Profiler.psiDrift(ref, cur, "v", 16)
      .as[(Long, Long, Long, Long)].collect().toList
    val twin = Profiler.psiAgainst(
      Profiler.referenceHistogram(ref, "v", 16), cur, "v", 16)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(twin == batch)
  }

  test("ksDrift: hand-computed D on a small fixture, exact integer scaling") {
    // ref fx {100, 200, 300}, cur fx {300, 400}: the ECDF gap peaks
    // at v=200 with |2/3 − 0| = 2/3 → d_e6 = 4·10⁶ div 6 = 666666
    val ref = Seq(1.0, 2.0, 3.0).toDF("v")
    val cur = Seq(3.0, 4.0).toDF("v")
    val out = Profiler.ksDrift(ref, cur, "v")
      .as[(Long, Long, Option[Long])].collect().toList
    assert(out == List((3L, 2L, Some(666666L))))
  }

  test("ksDrift plan: no join anywhere — one value histogram feeds the windows") {
    val a = (1L to 500L).map(_ * 0.01).toDF("v")
    val plan = Profiler.ksDrift(a, a, "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1500))
  }

  test("ksDrift: identical samples score zero; an empty side is NULL") {
    val a = Seq(1.0, 2.0, 2.0, 5.0).toDF("v")
    val same = Profiler.ksDrift(a, a, "v")
      .as[(Long, Long, Option[Long])].collect().toList
    assert(same == List((4L, 4L, Some(0L))))
    val empty = Profiler.ksDrift(a, a.filter(col("v") < 0), "v")
      .as[(Long, Long, Option[Long])].collect().toList
    assert(empty == List((4L, 0L, None)))
  }

  test("ksDrift: loud guard on a near-unique column; binned fallback still gates") {
    // 5000 distinct fx values against a cap of 1000: the exact form
    // must refuse (its prefix windows would sort the whole domain in
    // one partition) and point at the fallback
    val ref = (1L to 5000L).map(_ * 1.0).toDF("v")
    val cur = (1L to 5000L).map(_ + 2000.0).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Profiler.ksDrift(ref, cur, "v", domainCap = 1000)
    }
    assert(e.getMessage.contains("ksDriftBinned"))
    // the binned gate over 64 buckets still flags the location shift
    // (true D = 0.4; quantization can only lower it, and only a
    // little at this bin width)
    val binned = Profiler.ksDriftBinned(ref, cur, "v", buckets = 64)
      .as[(Long, Long, Option[Long])].collect().head
    assert(binned._1 == 5000L && binned._2 == 5000L)
    assert(binned._3.get > 300000L && binned._3.get <= 400000L)
  }

  test("ksDriftBinned degenerates to exact ksDrift when buckets cover the fx range") {
    val ref = Seq(1.0, 2.0, 3.0).toDF("v")
    val cur = Seq(3.0, 4.0).toDF("v")
    val exact = Profiler.ksDrift(ref, cur, "v")
      .as[(Long, Long, Option[Long])].collect().toList
    // fx range 100..400 (301 values) < 512 buckets → the binning is
    // injective and monotone, so the KS statistic is identical
    val binned = Profiler.ksDriftBinned(ref, cur, "v", buckets = 512)
      .as[(Long, Long, Option[Long])].collect().toList
    assert(binned == exact)
  }

  test("driftAgainst(referenceHistogram) equals the one-shot batch drift") {
    val ref = (0 until 1000).map(i => (i % 100) / 1.0).toDF("v")
    // current includes out-of-range mass (cur-only edge bucket) and
    // misses most reference buckets — both twin paths must agree
    val cur = ((0 until 200).map(_ => 12.5) ++
      (0 until 100).map(_ => 500.0)).toDF("v")
    val batch = Profiler.chiSquareDrift(ref, cur, "v", 16)
      .as[(Long, Long, Long, Long)].collect().toList
    val twin = Profiler.driftAgainst(
      Profiler.referenceHistogram(ref, "v", 16), cur, "v", 16)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(twin == batch)
  }

  test("profile is one scan: a single aggregate, no join in the plan") {
    val df = (1L to 100L).map(i => (i * 1.0, i * 2.0)).toDF("a", "b")
    val plan = Profiler.profile(df, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan.take(1200))
  }
}
