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
}
