package graft.similarity

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rankByScore: dense 1-based ranks, ties broken by id") {
    val df = Seq((3L, 10.0), (1L, 20.0), (2L, 10.0)).toDF("id", "s")
    val ranked = Fusion.rankByScore(df, "id", "s")
      .select($"id", $"rank").as[(Long, Int)].collect().toMap
    assert(ranked == Map(1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("rrf: hand-computed integer fusion with one-sided entries") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val out = Fusion.rrf(a, b, "id", k = 60, topN = 10)
      .select($"id", $"rrf_e9").as[(Long, Long)].collect().toList
    val t = (r: Int) => 1000000000L / (60 + r)
    assert(out == List(
      (2L, t(2) + t(1)),  // both lists
      (1L, t(1)),         // sparse only
      (4L, t(2)),         // dense only
      (3L, t(3))))
  }

  test("rrf: topN truncates on the total (score desc, id) order") {
    val a = (1L to 50L).map(i => (i, i.toInt)).toDF("id", "rank")
    val b = (1L to 50L).map(i => (i, i.toInt)).toDF("id", "rank")
    val out = Fusion.rrf(a, b, "id", k = 60, topN = 5)
      .select($"id").as[Long].collect().toList
    assert(out == List(1L, 2L, 3L, 4L, 5L))
  }
}
