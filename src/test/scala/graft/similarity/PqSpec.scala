package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated blobs in 4-d; ids 0/1 in different
  // blobs so the IVF-style init (first k by id) sees both
  private def blobs = (
    Seq((0L, Array(10f, 10f, 0f, 0f)), (1L, Array(-10f, -10f, 0f, 0f))) ++
      (2 until 10).map(i => (i.toLong, Array(10f + i * 0.01f, 10f, 0f, 0f))) ++
      (10 until 20).map(i => (i.toLong, Array(-10f, -10f + i * 0.01f, 0f, 0f)))
    ).toDF("id", "vec")

  test("m=1 PQ training is exactly Clustering.lloydAssign") {
    // with a single subspace the PQ Lloyd loop IS q120's clustering:
    // same init convention, same integer arithmetic, same argmin
    // tie-break — codes must match cluster ids row-for-row
    val (_, codes) = Pq.trainEncode(blobs, "id", "vec",
      dim = 4, m = 1, k = 2, iters = 2)
    val pq = codes.select($"__id", $"__cid").as[(Long, Int)].collect().toMap
    val lloyd = Clustering.lloydAssign(blobs, "id", "vec", k = 2, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(pq == lloyd)
  }

  test("an exact copy shares its source's codes, so its ADC distance is the per-query minimum") {
    // ADC scores dist(query_subvec, centroid-of-code): an exact copy
    // carries the query's own argmin codes, so its adist is the sum
    // of per-subspace minima — nothing can score lower (it CAN tie:
    // every vector in the same cell set scores identically, and the
    // (adist, id) tie-break then ranks the lowest id first)
    val dup = blobs.unionByName(
      blobs.filter($"id" < 2).withColumn("id", $"id" + 100L))
    val out = Pq.adcTopK(dup, "id", "vec",
      queries = dup.filter($"id" >= 100), dim = 4, m = 2, k = 2,
      iters = 2, topK = 30)
      .select($"query_id", $"neighbor_id", $"adist", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    for (q <- Seq(100L, 101L)) {
      val mine = out.filter(_._1 == q)
      val sourceAdist = mine.find(_._2 == q - 100L).map(_._3)
      assert(sourceAdist.contains(mine.map(_._3).min),
        s"query $q: source adist $sourceAdist vs min ${mine.map(_._3).min}")
    }
  }

  test("reruns are bit-identical (exact integer arithmetic end to end)") {
    def run() = Pq.adcTopK(blobs, "id", "vec",
      queries = blobs.filter($"id" >= 10 && $"id" < 14), dim = 4, m = 2,
      k = 2, iters = 2, topK = 3)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(run() == run())
  }

  test("ADC plans a broadcast equi-join on (subspace, code) — no cartesian, no sort-merge") {
    val plan = Pq.adcTopK(blobs, "id", "vec",
      queries = blobs.filter($"id" >= 10 && $"id" < 14), dim = 4, m = 2,
      k = 2, iters = 2, topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("guards: indivisible dim and non-numeric ids fail loudly") {
    intercept[IllegalArgumentException] {
      Pq.trainEncode(blobs, "id", "vec", dim = 4, m = 3, k = 2, iters = 1)
    }
    val strIds = blobs.select($"id".cast("string").as("id"), $"vec")
    intercept[IllegalArgumentException] {
      Pq.trainEncode(strIds, "id", "vec", dim = 4, m = 2, k = 2, iters = 1)
    }
  }
}
