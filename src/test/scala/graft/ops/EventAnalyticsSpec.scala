package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("orderedFunnel: strictly-increasing order required, not set membership") {
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(1)), (2L, "click", ts(2)),
      // u3 clicked BEFORE viewing — click must not count
      (3L, "click", ts(1)), (3L, "view", ts(2)), (3L, "purchase", ts(3)),
      // u4 never viewed
      (4L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.orderedFunnel(ev,
      "user_id", "event_type", "t", Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toList
    assert(out == List(
      (1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("orderedFunnel: equal timestamps do not satisfy the strict order") {
    val ev = Seq((1L, "view", ts(5)), (1L, "click", ts(5)))
      .toDF("user_id", "event_type", "t")
    val out = EventAnalytics.orderedFunnel(ev,
      "user_id", "event_type", "t", Seq("view", "click"))
      .as[(Int, String, Long)].collect().toList
    assert(out == List((1, "view", 1L), (2, "click", 0L)))
  }

  test("windowedFunnel: gap boundary is inclusive, gap+1 is out") {
    val ev = Seq(
      // u1: click exactly maxGap after view — converts
      (1L, "view", ts(100)), (1L, "click", ts(160)),
      // u2: one second past the gap — does not convert
      (2L, "view", ts(100)), (2L, "click", ts(161)),
      // u3: equal timestamps — strict order still required
      (3L, "view", ts(100)), (3L, "click", ts(100))
    ).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.windowedFunnel(ev,
      "user_id", "event_type", "t", Seq("view", "click"),
      maxGapMs = 60000L)
      .as[(Int, String, Long)].collect().toList
    assert(out == List((1, "view", 3L), (2, "click", 1L)))
  }

  test("windowedFunnel: viable-set semantics convert where greedy chaining fails") {
    // u1's earliest view (t=0) reaches no click within the 60 s gap,
    // but the later view at t=50 does — the viable-set chain converts;
    // a greedy min-anchored chain would not. u2 proves the purchase
    // step re-anchors off the click that actually converted.
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "view", ts(50)), (1L, "click", ts(100)),
      (2L, "view", ts(0)), (2L, "click", ts(30)), (2L, "click", ts(55)),
      (2L, "purchase", ts(110))
    ).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.windowedFunnel(ev,
      "user_id", "event_type", "t", Seq("view", "click", "purchase"),
      maxGapMs = 60000L)
      .as[(Int, String, Long)].collect().toList
    assert(out == List(
      (1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("windowedFunnel with a huge gap equals the unwindowed funnel") {
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(1)), (2L, "click", ts(2)),
      (3L, "click", ts(1)), (3L, "view", ts(2)), (3L, "purchase", ts(3)),
      (4L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "t")
    val steps = Seq("view", "click", "purchase")
    val windowed = EventAnalytics.windowedFunnel(ev,
      "user_id", "event_type", "t", steps, maxGapMs = Long.MaxValue / 4)
      .as[(Int, String, Long)].collect().toList
    val plain = EventAnalytics.orderedFunnel(ev,
      "user_id", "event_type", "t", steps)
      .as[(Int, String, Long)].collect().toList
    assert(windowed == plain)
  }

  test("transitionCounts: per-user adjacency only, deterministic tie order") {
    val ev = Seq(
      (1L, 10L, "view", ts(1)), (1L, 11L, "click", ts(2)),
      (1L, 12L, "view", ts(3)),
      (2L, 20L, "view", ts(1)), (2L, 21L, "click", ts(2)),
      // u3's two same-ts events order by id: 31 then 32
      (3L, 31L, "click", ts(5)), (3L, 32L, "purchase", ts(5)),
      (4L, 40L, "view", ts(9)) // single event: no transition
    ).toDF("user_id", "event_id", "event_type", "t")
    val out = EventAnalytics.transitionCounts(ev,
      "user_id", "event_type", "t", "event_id")
      .as[(String, String, Long)].collect().toList
    assert(out == List(
      ("click", "purchase", 1L),
      ("click", "view", 1L),
      ("view", "click", 2L)))
  }

  test("pathCounts: per-user trigram paths, short streams drop out") {
    val ev = Seq(
      (1L, 10L, "view", ts(1)), (1L, 11L, "click", ts(2)),
      (1L, 12L, "purchase", ts(3)), (1L, 13L, "view", ts(4)),
      // u2 has only 2 events: no length-3 path
      (2L, 20L, "view", ts(1)), (2L, 21L, "click", ts(2)),
      // u3's same-ts events order by id: view>click>purchase
      (3L, 30L, "view", ts(5)), (3L, 31L, "click", ts(5)),
      (3L, 32L, "purchase", ts(5))
    ).toDF("user_id", "event_id", "event_type", "t")
    val out = EventAnalytics.pathCounts(ev,
      "user_id", "event_type", "t", "event_id", len = 3)
      .as[(String, Long)].collect().toList
    assert(out == List(
      ("view>click>purchase", 2L),
      ("click>purchase>view", 1L)))
  }

  test("pathCounts: len=2 equals the transition matrix") {
    val ev = Seq(
      (1L, 10L, "view", ts(1)), (1L, 11L, "click", ts(2)),
      (1L, 12L, "view", ts(3)),
      (2L, 20L, "view", ts(1)), (2L, 21L, "click", ts(2))
    ).toDF("user_id", "event_id", "event_type", "t")
    val paths = EventAnalytics.pathCounts(ev,
      "user_id", "event_type", "t", "event_id", len = 2)
      .as[(String, Long)].collect().toMap
    val trans = EventAnalytics.transitionCounts(ev,
      "user_id", "event_type", "t", "event_id")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (s"$a>$b", n) }.toMap
    assert(paths == trans)
  }

  test("conversionLatency: first-view to first-later-purchase, ceil-rank values") {
    val ev = Seq(
      // u1: view@10, purchase@30 → 20 s
      (1L, "view", ts(10)), (1L, "purchase", ts(30)),
      // u2: purchase BEFORE the first view must not count; later one does
      (2L, "purchase", ts(5)), (2L, "view", ts(10)), (2L, "purchase", ts(50)),
      // u3: view only — drops
      (3L, "view", ts(1)),
      // u4: purchase at the same ms as the view — strict after, drops
      (4L, "view", ts(7)), (4L, "purchase", ts(7)),
      // u5: 10 s
      (5L, "view", ts(0)), (5L, "purchase", ts(10))
    ).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.conversionLatency(ev,
      "user_id", "event_type", "t", "view", "purchase")
      .as[(Long, Long, Long, Long)].head()
    // latencies {10000, 20000, 40000}: rank ⌈50·3/100⌉=2 → 20000,
    // rank ⌈90·3/100⌉=3 → 40000
    assert(out == ((3L, 20000L, 40000L, 40000L)))
  }

  test("conversionLatency: histogram rank equals the row-rank form, with ties") {
    val rnd = new scala.util.Random(7)
    // heavy latency ties: durations drawn from a small set so the
    // histogram path must reproduce value-at-rank through tied runs
    val ev = (1 to 300).flatMap { u =>
      val s = rnd.nextInt(1000).toLong
      val conv = rnd.nextInt(10) < 7
      Seq((u.toLong, "view", ts(s))) ++
        (if (conv) Seq((u.toLong, "purchase",
          ts(s + 1 + rnd.nextInt(8)))) else Nil)
    }.toDF("user_id", "event_type", "t")
    val got = EventAnalytics.conversionLatency(ev,
      "user_id", "event_type", "t", "view", "purchase")
      .as[(Long, Long, Long, Long)].head()
    // row-rank replay: value at rank ⌈p·n/100⌉ over the sorted list
    val lats = ev.as[(Long, String, java.sql.Timestamp)].collect()
      .groupBy(_._1).flatMap { case (_, rows) =>
        val v = rows.filter(_._2 == "view").map(_._3.getTime).min
        val ps = rows.filter(r => r._2 == "purchase" && r._3.getTime > v)
        if (ps.isEmpty) None else Some(ps.map(_._3.getTime).min - v)
      }.toSeq.sorted
    val n = lats.size
    def atRank(p: Int) = lats((p * n + 99) / 100 - 1)
    assert(got == ((n.toLong, atRank(50), atRank(90), lats.max)))
  }

  test("cohortRetention: the retention triangle off first-activity weeks") {
    val wk = 7L * 86400L
    val ev = Seq(
      (1L, ts(0)), (1L, ts(wk + 5)), (1L, ts(3 * wk + 5)),
      (2L, ts(10)),
      (3L, ts(wk + 1)), (3L, ts(2 * wk + 1))
    ).toDF("user_id", "t")
    val out = EventAnalytics.cohortRetention(ev, "user_id", "t")
      .as[(Long, Long, Long)].collect().toList
    assert(out == List(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }
}
