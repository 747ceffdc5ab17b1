package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // chain 1-2-3-4 with seed at 1; isolated 5; 6 tied between seeds
  private def nodes = Seq(
    (1L, Some("a")), (2L, None), (3L, None), (4L, None),
    (5L, None),
    (6L, None), (7L, Some("b")), (8L, Some("a"))
  ).toDF("id", "lbl")

  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L),
    (6L, 7L), (6L, 8L)
  ).toDF("src", "dst")

  private def run(rounds: Int): Map[Long, Option[String]] =
    LabelProp.propagate(nodes, edges, "id", "lbl", "src", "dst", rounds)
      .as[(Long, Option[String])].collect().toMap

  test("labels spread one hop per round; seeds and isolates are stable") {
    val r1 = run(1)
    assert(r1(1L).contains("a") && r1(2L).contains("a"))
    assert(r1(3L).isEmpty && r1(4L).isEmpty) // 2 hops away after 1 round
    assert(r1(5L).isEmpty)                   // isolated: never labeled
    val r2 = run(2)
    assert(r2(3L).contains("a") && r2(4L).isEmpty)
    val r3 = run(3)
    assert(r3(4L).contains("a"))
  }

  test("equal votes break toward the smaller label; edges are symmetric") {
    // 6 hears "b" from 7 and "a" from 8 (one vote each) → "a"
    assert(run(1)(6L).contains("a"))
    // symmetry: seed 1 is reachable from 2 even though the edge is (1,2)
    val withSeedAt2 = Seq((1L, None), (2L, Some("x")))
      .toDF("id", "lbl")
    val out = LabelProp.propagate(withSeedAt2,
      Seq((1L, 2L)).toDF("src", "dst"), "id", "lbl", "src", "dst", 1)
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("x"))
  }
}
