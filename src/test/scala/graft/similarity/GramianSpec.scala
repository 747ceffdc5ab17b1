package graft.similarity

import graft.SparkSpec

class GramianSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random float vectors, several partitions so
  // the treeReduce path actually merges partials
  private def fixture(n: Int, d: Int) = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { id =>
      (id.toLong, Array.fill(d)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding").repartition(5)
  }

  test("gramBlas equals gramAggregate exactly (integer fixed-point)") {
    val df = fixture(n = 50, d = 16)
    val agg = Gramian.gramAggregate(df, "embedding")
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val blas = Gramian.gramBlas(df, "embedding")
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(agg.size == 16 * 17 / 2)
    assert(blas == agg)
  }

  test("gramBlas handles empty partitions and negative products") {
    // 3 rows over 8 partitions: most partitions empty; mixed-sign
    // values so floor's toward-negative-infinity behavior is hit
    // (floor(-0.3) = -1, NOT truncation toward zero)
    val df = Seq(
      (1L, Array(1.5f, -2.25f)),
      (2L, Array(-0.5f, 0.75f)),
      (3L, Array(0.001f, -0.001f))
    ).toDF("vec_id", "embedding").repartition(8)
    val agg = Gramian.gramAggregate(df, "embedding")
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val blas = Gramian.gramBlas(df, "embedding")
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(blas == agg)
    // spot-check one cell by hand: (0,1) = Σ floor(1e6 · x0·x1)
    val want01 = Seq((1.5, -2.25), (-0.5, 0.75), (0.001, -0.001))
      .map { case (a, b) =>
        math.floor(1e6 * (a.toFloat.toDouble * b.toFloat.toDouble)).toLong
      }.sum
    assert(blas.find(r => r._1 == 0 && r._2 == 1).get._3 == want01)
  }

  test("gramBlas on an empty frame returns an empty (i, j, gram_fx) frame") {
    val df = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Gramian.gramBlas(df, "embedding")
    assert(out.columns.toSeq == Seq("i", "j", "gram_fx"))
    assert(out.count() == 0)
  }

  test("gramBlas plan has no Generate — the aggregate twin's constant factor") {
    val df = fixture(n = 10, d = 4)
    val aggPlan = Gramian.gramAggregate(df, "embedding")
      .queryExecution.executedPlan.toString
    assert(aggPlan.contains("Generate"))
    // the BLAS form's result is driver-assembled from bounded
    // partials; its plan is a LocalTableScan of d(d+1)/2 rows
    val blasPlan = Gramian.gramBlas(df, "embedding")
      .queryExecution.executedPlan.toString
    assert(!blasPlan.contains("Generate"))
  }
}
