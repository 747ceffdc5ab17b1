package graft.similarity

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated blobs in 4-d
  private def blobs = (
    (0 until 10).map(i => (i.toLong, Array(10f + i * 0.01f, 10f, 0f, 0f))) ++
      (10 until 20).map(i => (i.toLong, Array(-10f, -10f + i * 0.01f, 0f, 0f)))
    ).toDF("id", "vec")

  test("separable blobs land in separate clusters, exhaustively") {
    val assign = Clustering.kmeansAssign(blobs, "id", "vec", k = 2,
      maxIter = 10).as[(Long, Int)].collect().toMap
    val a = (0 until 10).map(i => assign(i.toLong)).toSet
    val b = (10 until 20).map(i => assign(i.toLong)).toSet
    assert(a.size == 1 && b.size == 1 && a != b,
      s"blobs not separated: $assign")
  }

  test("clusterSizes histogram is deterministic under the seed") {
    def run() = Clustering.clusterSizes(blobs, "id", "vec", k = 2)
      .as[(Int, Long)].collect().toSeq
    val r = run()
    assert(r.map(_._2).sorted == Seq(10L, 10L))
    assert(r == run())
  }

  test("lloydAssign separates blobs and is exactly deterministic") {
    // ids 0 and 1 must live in different blobs for the IVF-style
    // init (first k by id) to see both: remap one blob's ids
    val mixed = blobs.withColumn("id",
      org.apache.spark.sql.functions.expr(
        "CASE WHEN id = 1 THEN 11 WHEN id = 11 THEN 1 ELSE id END"))
    def run() = Clustering.lloydAssign(mixed, "id", "vec", k = 2,
      iters = 2).as[(Long, Int)].collect().toMap
    val assign = run()
    val a = (Seq(0L, 11L) ++ (2L to 9L)).map(assign)
    val b = (Seq(1L, 10L) ++ (12L to 19L)).map(assign)
    assert(a.toSet.size == 1 && b.toSet.size == 1 && a.head != b.head,
      s"blobs not separated: $assign")
    // exact-integer arithmetic: a rerun is bit-identical, not
    // just statistically close
    assert(run() == assign)
  }

  test("lloydAssign guards its IVF-init assumptions loudly") {
    // string ids: rejected up front (would string-compare id < k)
    val strIds = blobs.select(
      org.apache.spark.sql.functions.col("id").cast("string").as("id"),
      org.apache.spark.sql.functions.col("vec"))
    intercept[IllegalArgumentException] {
      Clustering.lloydAssign(strIds, "id", "vec", k = 2)
    }
    // sparse ids (no id 0): too few centroids → loud failure, not
    // null clusters
    val sparse = blobs.filter(org.apache.spark.sql.functions.col("id") > 0)
    intercept[IllegalArgumentException] {
      Clustering.lloydAssign(sparse, "id", "vec", k = 2)
    }
    // semDedup shares the convention and the guard
    intercept[IllegalArgumentException] {
      Clustering.semDedup(strIds, "id", "vec", nCentroids = 2, tau = 0.9)
    }
    intercept[IllegalArgumentException] {
      Clustering.semDedup(sparse, "id", "vec", nCentroids = 2, tau = 0.9)
    }
  }

  test("semDedup flags lower-id near-twins within a cluster only") {
    // ids 0/1 seed the two centroids; 2 is a near-twin of 0, 3 a
    // near-twin of 1, 4 lands in cluster 0 but below tau vs everyone.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),   // centroid 0
      (1L, Array(0f, 1f, 0f, 0f)),   // centroid 1
      (2L, Array(0.999f, 0.01f, 0f, 0f)), // dup of 0
      (3L, Array(0.01f, 0.999f, 0f, 0f)), // dup of 1
      (4L, Array(0.7f, 0.2f, 0.68f, 0f))  // cluster 0, but cos < tau
    ).toDF("id", "vec")
    val out = Clustering.semDedup(vecs, "id", "vec",
      nCentroids = 2, tau = 0.95)
      .orderBy($"id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(x => x._1 -> x._3).toMap ==
      Map(0L -> false, 1L -> false, 2L -> true, 3L -> true, 4L -> false))
    // twins share their source's cluster
    val cl = out.map(x => x._1 -> x._2).toMap
    assert(cl(2L) == cl(0L) && cl(3L) == cl(1L) && cl(4L) == cl(0L))
  }

  test("semDedup keep-lowest-id: the source of a twin is never flagged") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (5L, Array(1f, 0f)), (6L, Array(1f, 0f))  // two exact copies of 0
    ).toDF("id", "vec")
    val out = Clustering.semDedup(vecs, "id", "vec", 2, 0.99)
      .orderBy($"id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(x => x._1 -> x._3).toMap ==
      Map(0L -> false, 1L -> false, 5L -> true, 6L -> true))
  }
}
