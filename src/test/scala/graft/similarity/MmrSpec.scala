package graft.similarity

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def run(cand: Seq[(Long, Long)], sims: Seq[(Long, Long, Long)],
      k: Int, lamTen: Int = 7) =
    Mmr.rerank(cand.toDF("id", "rel_e6"), sims.toDF("id_a", "id_b", "sim_e6"),
        k, lamTen)
      .as[(Long, Long, Long, Long, Long)].collect().toList.sortBy(_._1)

  test("diversity penalty: a near-duplicate of the top pick loses to a weaker diverse one") {
    // id 2 is second-best by relevance but near-identical to id 1;
    // id 3 is weaker but diverse: 7·90−3·95=345 < 7·80−3·10=530.
    val sims = Seq((1L, 2L, 95L), (2L, 1L, 95L), (1L, 3L, 10L),
      (3L, 1L, 10L), (2L, 3L, 10L), (3L, 2L, 10L))
    val out = run(Seq((1L, 100L), (2L, 90L), (3L, 80L)), sims, k = 2)
    assert(out == List((1L, 1L, 100L, 0L, 700L), (2L, 3L, 80L, 10L, 530L)))
    // pure relevance (λ=1.0) keeps the duplicate instead
    val rel = run(Seq((1L, 100L), (2L, 90L), (3L, 80L)), sims,
      k = 2, lamTen = 10)
    assert(rel.map(_._2) == List(1L, 2L))
  }

  test("maxsim is the max over ALL picked so far; ties break to smaller id") {
    // ids 2 and 3 tie exactly after pick 1 -> 2 wins on id; pick 3's
    // maxsim must read the max against BOTH picked items.
    val sims = Seq((1L, 2L, 50L), (2L, 1L, 50L), (1L, 3L, 50L),
      (3L, 1L, 50L), (2L, 3L, 80L), (3L, 2L, 80L))
    val out = run(Seq((1L, 100L), (2L, 60L), (3L, 60L)), sims, k = 3)
    assert(out.map(_._2) == List(1L, 2L, 3L))
    assert(out(2)._4 == 80L) // vs picked {1, 2}: max(50, 80)
  }

  test("missing sim pairs read 0; k beyond candidates stops early") {
    val out = run(Seq((5L, 10L), (6L, 20L)), Seq.empty, k = 8)
    assert(out.map(r => (r._1, r._2, r._4)) ==
      List((1L, 6L, 0L), (2L, 5L, 0L)))
  }
}
