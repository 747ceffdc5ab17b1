package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_test_index/$tag"

  private def blobs = (
    Seq((0L, Array(10f, 10f, 0f, 0f)), (1L, Array(-10f, -10f, 0f, 0f))) ++
      (2 until 10).map(i => (i.toLong, Array(10f + i * 0.01f, 10f, 0f, 0f))) ++
      (10 until 20).map(i => (i.toLong, Array(-10f, -10f + i * 0.01f, 0f, 0f)))
    ).toDF("id", "vec")

  test("PQ index survives save/load: artifact probe == fresh-build probe") {
    val queries = blobs.filter($"id" >= 10 && $"id" < 14)
    val (cents, codes) = Pq.trainEncode(blobs, "id", "vec",
      dim = 4, m = 2, k = 2, iters = 2)
    val direct = Pq.adcTopKWith(cents, codes, queries, "id", "vec",
        dim = 4, m = 2, topK = 3)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Long, Int)].collect().toList
    val path = tmp("pq")
    IndexStore.savePq(cents, codes, path, dim = 4, m = 2,
      quantScale = 1e6)
    val loaded = IndexStore.pqTopK(spark, path, queries, "id", "vec",
        topK = 3)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Long, Int)].collect().toList
    assert(loaded == direct)
    assert(direct.nonEmpty)
  }

  test("IVF index survives save/load: artifact probe == ivfTopK, corpus untouched") {
    val corpus = (0 until 24).map { i =>
      val base = if (i % 2 == 0) Array(5f, 0f, 1f) else Array(0f, 5f, 1f)
      (i.toLong, base.map(_ + i * 0.001f))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" >= 20)
    val direct = Ann.ivfTopK(corpus, "vec_id", "embedding",
        nCentroids = 2, nProbe = 1, queries, k = 4)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Double, Int)].collect().toList
    val (cents, assigned) =
      Ann.ivfIndex(corpus, "vec_id", "embedding", nCentroids = 2)
    val path = tmp("ivf")
    IndexStore.saveIvf(cents, assigned, path, roundTo = 6)
    val loaded = IndexStore.ivfTopK(spark, path, queries,
        "vec_id", "embedding", nProbe = 1, k = 4)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Double, Int)].collect().toList
    assert(loaded == direct)
    assert(direct.nonEmpty)
  }

  test("artifact probe plan scans the index parquet, never the corpus source") {
    val path = tmp("pq_plan")
    val (cents, codes) = Pq.trainEncode(blobs, "id", "vec",
      dim = 4, m = 2, k = 2, iters = 1)
    IndexStore.savePq(cents, codes, path, dim = 4, m = 2,
      quantScale = 1e6)
    val queries = blobs.filter($"id" < 2)
    val plan = IndexStore.pqTopK(spark, path, queries, "id", "vec",
        topK = 2)
      .queryExecution.executedPlan.toString
    // the only file scans are the artifact's: codes + codebooks
    val scans = plan.linesIterator
      .filter(_.contains("Scan parquet")).toList
    assert(scans.nonEmpty && scans.forall(_.contains("graft_test_index")),
      scans.mkString("\n"))
  }
}
