package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(2.0f, 0.0f, 0.0f)),   // parallel to 1
    (4L, Seq(1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dot / norm / cosine basics") {
    val row = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(Ann.dot($"a", $"b").as("d"), Ann.norm($"a").as("n"),
        round(Ann.cosine($"a", $"a"), 9).as("self"))
      .as[(Double, Double, Double)].head()
    assert(row._1 == 32.0)
    assert(math.abs(row._2 - math.sqrt(14.0)) < 1e-9)
    assert(row._3 == 1.0)
  }

  test("cosineTopK ranks parallel vector first, orthogonal last") {
    val out = Ann.cosineTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 3)
      .select("neighbor_id", "cos", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(3L, 4L, 2L))
    assert(out(0)._2 == 1.0)       // parallel → cos 1
    assert(out(2)._2 == 0.0)       // orthogonal → cos 0
  }

  test("rhpSignature groups identical directions together") {
    val sigs = vecs.select($"vec_id",
      Ann.rhpSignature($"embedding", planes = 8).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(3L)) // same direction → same bucket
  }

  test("lshTopK finds the parallel neighbor inside its bucket") {
    val out = Ann.lshTopK(vecs, "vec_id", "embedding", planes = 8, k = 2)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    val q1 = out.filter(_._1 == 1L)
    assert(q1.exists(r => r._2 == 3L && r._3 == 1.0))
  }
}
