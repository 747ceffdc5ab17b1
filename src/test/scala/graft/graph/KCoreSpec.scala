package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("2-core of a triangle with pendant chains is exactly the triangle") {
    // triangle 1-2-3 plus a chain 3-4-5 and a pendant 1-6: peeling
    // removes 6, then 5, then 4 — multi-round, order-dependent if
    // done wrong
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (1L, 6L)).toDF("a", "b")
    val core = KCore.coreDegrees(edges, "a", "b", k = 2)
      .as[(Long, Long)].collect().toSet
    assert(core == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("k-core can be empty, and the convergence guard trips loudly") {
    // a path graph has no 2-core
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(KCore.coreDegrees(path, "a", "b", k = 2).count() == 0L)
    // peeling the same path needs 2 rounds; maxRounds = 1 must
    // throw, not silently return the half-peeled supergraph
    val e = intercept[IllegalArgumentException] {
      KCore.kCore(path, "a", "b", k = 2, maxRounds = 1).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
