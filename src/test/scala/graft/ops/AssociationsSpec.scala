package graft.ops

import graft.SparkSpec

class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules: hand-computed support, confidence, lift") {
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 2L), // duplicate item in b1
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 4L)
    ).toDF("bk", "it")
    val out = Associations.pairRules(baskets, "bk", "it",
        minSupport = 2, k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toList
    // only {1,2} reaches support 2 (appears in b1, b2, b3); N=4
    // conf(1→2) = 3/3; lift = 3·4 / (3·3) = 4/3
    assert(out == List(
      (1L, 2L, 3L, 3L, 3L, 1000000L, 1333333L),
      (2L, 1L, 3L, 3L, 3L, 1000000L, 1333333L)))
  }

  test("pairRules: asymmetric confidence, symmetric lift") {
    // item 1 in 4 baskets, item 2 in 2; together in 2
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (4L, 1L)).toDF("bk", "it")
    val out = Associations.pairRules(baskets, "bk", "it",
        minSupport = 2, k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toList
    // lift = 2·4/(4·2) = 1 for both directions;
    // conf(1→2) = 2/4, conf(2→1) = 2/2 — confidence must differ
    assert(out == List(
      (2L, 1L, 2L, 2L, 4L, 1000000L, 1000000L),
      (1L, 2L, 2L, 4L, 2L, 500000L, 1000000L)))
  }
}
