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

  test("hyperplane family stays diverse: no near-parallel planes " +
      "(the r13 affine-hash regression)") {
    // the original affine-in-j weight hash made planes constant
    // shifts of one walk — 16 "planes" produced ~149 distinct
    // signatures over 55k uniform vectors. Pin the diversity: over
    // 2000 seeded-PRNG vectors at 16 planes, the signature space
    // must stay close to saturated and no bucket may go hot. Any
    // future "simplification" of Ann.hyperplane that reintroduces
    // shift structure fails these bounds immediately.
    val vecs = (0 until 2000).map { s =>
      val r = new scala.util.Random(s)
      (s.toLong, Array.fill(16)(r.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val sigs = vecs.select(Ann.rhpSignature($"embedding", 16).as("sig"))
      .groupBy($"sig").count()
      .as[(Long, Long)].collect()
    assert(sigs.length >= 1500,
      s"only ${sigs.length} distinct signatures for 2000 vectors")
    assert(sigs.map(_._2).max <= 20,
      s"hot bucket of ${sigs.map(_._2).max} vectors")
  }

  test("lshTopK finds the parallel neighbor inside its bucket") {
    val out = Ann.lshTopK(vecs, "vec_id", "embedding", planes = 8, k = 2)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    val q1 = out.filter(_._1 == 1L)
    assert(q1.exists(r => r._2 == 3L && r._3 == 1.0))
  }

  test("ivfTopK searches only probed clusters and ranks exactly") {
    // 2 well-separated directions; centroids are ids 0/1 by contract
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),   // centroid A
      (1L, Seq(0.0f, 1.0f, 0.0f)),   // centroid B
      (10L, Seq(0.9f, 0.1f, 0.0f)),  // cluster A
      (11L, Seq(0.8f, 0.2f, 0.0f)),  // cluster A
      (20L, Seq(0.1f, 0.9f, 0.0f))   // cluster B
    ).toDF("vec_id", "embedding")
    val out = Ann.ivfTopK(corpus, "vec_id", "embedding",
      nCentroids = 2, nProbe = 1,
      queries = corpus.filter($"vec_id" === 10L), k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    // probe=1 → only cluster A members are candidates; 20L is unseen
    assert(out.map(_._1).toSet.subsetOf(Set(0L, 10L, 11L)))
    // cos(q,0)=0.994 beats cos(q,11)=0.991 — the centroid vector is
    // itself a corpus member and the query's nearest neighbor
    assert(out.map(_._1).toSeq == Seq(0L, 11L))
  }

  test("ivfTopK with all clusters probed matches brute force") {
    val corpus = vecs
    val queries = corpus.filter($"vec_id" === 4L)
    val ivf = Ann.ivfTopK(corpus, "vec_id", "embedding",
      nCentroids = 4, nProbe = 4, queries = queries, k = 3)
      .select("neighbor_id", "cos", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = Ann.cosineTopK(corpus, queries, "vec_id", "embedding", k = 3)
      .select("neighbor_id", "cos", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(ivf == brute)
  }

  test("cosineDupPairs finds exactly the parallel pairs") {
    val out = Ann.cosineDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.999)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 3L, 1.0))) // only the scaled copy
  }

  private def labeled = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f), 0),
    (2L, Seq(0.9f, 0.1f, 0.0f), 0),   // same label as 1 — never its negative
    (3L, Seq(2.0f, 0.0f, 0.0f), 1),   // parallel, other label → hardest
    (4L, Seq(0.0f, 1.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("hardNegatives picks the nearest OTHER-label vector first") {
    val out = Ann.hardNegatives(labeled,
      labeled.filter($"vec_id" === 1L), "vec_id", "embedding", "label",
      k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    // same-label near-dup (2) must NOT appear; hardest negative is 3
    assert(out.map(_._1).toSeq == Seq(3L, 4L))
  }

  test("hardNegativesLsh returns a subset of brute pairs with equal scores") {
    val brute = Ann.hardNegatives(labeled, labeled, "vec_id",
      "embedding", "label", k = 10)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Ann.hardNegativesLsh(labeled, "vec_id", "embedding",
      "label", planes = 8, k = 10)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, n, c) =>
      assert(brute.get((q, n)).contains(c), s"pair ($q,$n) not in brute")
    }
    // co-directional other-label vectors share a bucket: 1↔3 found
    assert(lsh.exists(r => r._1 == 1L && r._2 == 3L))
  }
}
