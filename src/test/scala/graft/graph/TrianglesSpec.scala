package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.stats(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].head()

  test("K3: one triangle, gcc exactly 1") {
    assert(stats(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
      == ((3L, 3L, 3L, 1L, 1000000L)))
  }

  test("K4: four triangles, gcc exactly 1") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(stats(k4) == ((4L, 6L, 12L, 4L, 1000000L)))
  }

  test("path: a wedge but no triangle") {
    assert(stats(Seq((1L, 2L), (2L, 3L)))
      == ((3L, 2L, 1L, 0L, 0L)))
  }

  test("hub star with one closing edge: orientation survives the hub") {
    val star = (2L to 6L).map(l => (1L, l))
    val s = stats(star :+ (2L, 3L))
    // degrees: hub 5, nodes 2/3 have 2, others 1 → wedges 10+1+1=12;
    // exactly the (1,2,3) triangle closes
    assert(s == ((6L, 6L, 12L, 1L, 250000L)))
  }

  test("result is partition-invariant") {
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
    val rep = Triangles.stats(k4.toDF("a", "b").repartition(7), "a", "b")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(rep == ((4L, 6L, 12L, 4L, 1000000L)))
  }
}
