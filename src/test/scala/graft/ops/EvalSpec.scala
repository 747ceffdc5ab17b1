package graft.ops

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Long) =
    Eval.aucE6(rows.toDF("s", "pos"), "s", "pos")
      .as[(Long, Long, Long)].head()

  test("perfect separation scores exactly 1.0; reversed exactly 0.0") {
    val perfect = (1L to 50L).map(i => (i, if (i > 25) 1L else 0L))
    assert(auc(perfect) == ((25L, 25L, 1000000L)))
    val reversed = (1L to 50L).map(i => (i, if (i <= 25) 1L else 0L))
    assert(auc(reversed) == ((25L, 25L, 0L)))
  }

  test("a constant score (all ties) is exactly 0.5") {
    val ties = (1L to 40L).map(i => (7L, if (i % 4 == 0) 1L else 0L))
    assert(auc(ties) == ((10L, 30L, 500000L)))
  }

  test("hand-computed tie case") {
    // scores: pos at {3, 2}, neg at {2, 1}.
    // pairs: (3>2)=1, (3>1)=1, (2=2)=0.5, (2>1)=1 → AUC = 3.5/4
    val rows = Seq((3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L))
    assert(auc(rows) == ((2L, 2L, 875000L)))
  }

  test("deterministic under repartitioning") {
    val rows = (1L to 500L).map(i => (i % 37, i % 3 / 2))
    val a = Eval.aucE6(rows.toDF("s", "pos").repartition(7), "s", "pos")
      .as[(Long, Long, Long)].head()
    assert(a == auc(rows))
  }

  test("aucE6: a single-class batch reads NULL, not an error or silent null") {
    val allPos = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("s", "pos")
    val a = Eval.aucE6(allPos, "s", "pos")
      .select($"n_pos", $"n_neg", $"auc_e6".isNull).as[(Long, Long, Boolean)]
      .head()
    assert(a == ((3L, 0L, true)))
  }

  test("cohenKappaE6: hand-computed 2x2, perfect/chance/negative cases, sign-guarded") {
    def kappa(rows: Seq[(String, String)]): (Long, Long, Option[Long]) =
      Eval.cohenKappaE6(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Option[Long])].head()
    // perfect agreement with mixed marginals = exactly 1
    assert(kappa(Seq(("x", "x"), ("y", "y"), ("x", "x"))) ==
      ((3L, 3L, Some(1000000L))))
    // the textbook 2x2: n=100, agree=70, marginals a:(60,40) b:(50,50)
    // → pe_num = 60*50+40*50 = 5000; κ = (7000-5000)/(10000-5000) = 0.4
    val rows = Seq.fill(40)(("p", "p")) ++ Seq.fill(20)(("p", "n")) ++
      Seq.fill(10)(("n", "p")) ++ Seq.fill(30)(("n", "n"))
    assert(kappa(rows) == ((100L, 70L, Some(400000L))))
    // systematic disagreement goes NEGATIVE, truncated toward zero
    // (n=4, agree=0, pe_num=8: κ = -8/8 = -1)
    assert(kappa(Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"))) ==
      ((4L, 0L, Some(-1000000L))))
    // and a non-integer negative: n=3, agree=0, a:(2x,1y) b:(1x,2y)
    // → pe=4, κ = -4/5 = -0.8
    assert(kappa(Seq(("x", "y"), ("x", "y"), ("y", "x"))) ==
      ((3L, 0L, Some(-800000L))))
    // constant identical labels: chance term = n² → NULL, not 1
    assert(kappa(Seq(("x", "x"), ("x", "x"))) == ((2L, 2L, None)))
  }

  test("calibrationBins: hand-computed bins, exact truncating divisions") {
    // scores 0..99, positive iff score >= 60: with 10 bins over
    // range 0..99 each bin holds exactly 10 rows; bins 0-5 have no
    // positives, bins 6-9 are all-positive
    val df = (0L until 100L).map(s => (s, if (s >= 60) 1L else 0L))
      .toDF("s", "pos")
    val out = Eval.calibrationBins(df, "s", "pos", bins = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(out.map(_._1) == (0L to 9L).toList)
    assert(out.forall(_._2 == 10L))
    out.foreach { case (b, _, np, ms, rate) =>
      // mean of 10 consecutive ints 10b..10b+9 truncates to 10b + 4
      assert(ms == 10 * b + 4, s"bin $b mean $ms")
      if (b < 6) { assert(np == 0L); assert(rate == 0L) }
      else { assert(np == 10L); assert(rate == 1000000L) }
    }
    // a half-positive bin divides exactly: 5 * 1e6 / 10
    val mixed = ((0L until 10L).map(s => (s, s % 2)) :+ (99L, 1L))
      .toDF("s", "pos")
    val m0 = Eval.calibrationBins(mixed, "s", "pos", bins = 10)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(m0 == ((0L, 10L, 5L, 4L, 500000L)))
  }

  test("calibrationBins: opposite-sign range beyond Long raises the " +
      "bin-overflow error, never wrapped garbage bins") {
    // min ≈ -2^62, max ≈ 2^62 → true range ≈ 2^63 overflows a long;
    // the plain __mx - __mn would wrap negative and slip past the
    // guard (ADVICE r12) — try_subtract makes the CASE fall through
    // to raise_error instead
    val df = Seq((-(1L << 62), 0L), (1L << 62, 1L)).toDF("s", "pos")
    val e = intercept[Exception] {
      Eval.calibrationBins(df, "s", "pos", bins = 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bin overflow")),
      s"expected the raise_error, got: $e")
  }

  test("meters divide by the query's own exact-list size, not nominal k") {
    // query 1 has only TWO true neighbors; a perfect approximate
    // list must score full recall and full NDCG
    val exact = Seq((1L, 10L), (1L, 11L)).toDF("q", "n")
    val approx = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "n", "rank")
    val r = Eval.recallAtK(approx, exact, "q", "n", 5)
      .as[(Long, Long, Long)].head()
    assert(r == ((1L, 2L, 1000000L)))
    val nd = Eval.ndcgAtK(approx, exact, "q", "n", "rank", 5)
      .as[(Long, Long, Long)].head()
    assert(nd._3 == 1000000L)
  }

  test("ndcgAtK: position-discounted hits, perfect ranking scores 1e6") {
    val d = Eval.ndcgDiscountsE6(3)
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L),
      (3L, 30L), (3L, 31L), (3L, 32L)).toDF("q", "n")
    val approx = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // perfect order
      (2L, 99L, 1), (2L, 20L, 2), (2L, 98L, 3)  // one hit at pos 2
      // query 3 starved
    ).toDF("q", "n", "rank")
    val out = Eval.ndcgAtK(approx, exact, "q", "n", "rank", 3)
      .as[(Long, Long, Long)].collect().toList
    val idcg = d.sum
    assert(out == List(
      (1L, idcg, 1000000L),
      (2L, d(1), d(1) * 1000000L / idcg),
      (3L, 0L, 0L)))
  }

  test("recallAtK: hits counted, extras ignored, starved queries score 0") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L),
      (3L, 30L), (3L, 31L), (3L, 32L)).toDF("q", "n")
    val approx = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),   // perfect
      (2L, 20L), (2L, 99L), (2L, 98L)    // 1 of 3; extras don't count
      // query 3 starved entirely
    ).toDF("q", "n")
    val out = Eval.recallAtK(approx, exact, "q", "n", 3)
      .as[(Long, Long, Long)].collect().toList
    assert(out == List(
      (1L, 3L, 1000000L),
      (2L, 1L, 333333L),
      (3L, 0L, 0L)))
  }
}
