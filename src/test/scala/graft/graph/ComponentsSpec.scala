package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains, cycles, and singletons") {
    // chain 1-2-3-4, triangle 10-11-12 (with a cycle edge), isolated 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val comp = Components.connectedComponents(nodes, edges, "id", "a", "b")
      .orderBy("id")
      .as[(Long, Long)].collect()
    assert(comp.toMap === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("edge direction does not matter") {
    val edges = Seq((5L, 3L), (3L, 9L)).toDF("x", "y")
    val nodes = Seq(3L, 5L, 9L).toDF("id")
    val comp = Components.connectedComponents(nodes, edges, "id", "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("long path converges within the iteration budget") {
    // path 0-1-2-...-15: worst-case diameter for min propagation
    val edges = (0L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L to 15L).toDF("id")
    val comp = Components.connectedComponents(nodes, edges, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet === Set(0L))
  }

  test("agrees with GraphX connectedComponents on a pseudo-random graph") {
    // Deterministic LCG edge set: 400 nodes, 300 edges — a mix of
    // small clusters, chains, and singletons. GraphX's Pregel CC is
    // an independent implementation whose component label is also
    // the min vertex id.
    var s = 12345L
    def next(mod: Long): Long = { s = (s * 1103515245L + 12345L) & 0x7FFFFFFFL; s % mod }
    val edgePairs = Seq.fill(300)((next(400), next(400)))
      .filter { case (a, b) => a != b }
    val edges = edgePairs.toDF("a", "b")
    val nodes = (0L until 400L).toDF("id")
    val ours = Components.connectedComponents(nodes, edges, "id", "a", "b")
      .as[(Long, Long)].collect().toMap

    import org.apache.spark.graphx.{Edge, Graph}
    val er = spark.sparkContext.parallelize(
      edgePairs.map { case (a, b) => Edge(a, b, 1) })
    val theirs = Graph.fromEdges(er, 0)
      .connectedComponents().vertices.collect().toMap
    // GraphX only labels nodes that appear in edges; ours labels all.
    theirs.foreach { case (id, comp) =>
      assert(ours(id) === comp, s"node $id")
    }
    val edgeNodes = theirs.keySet
    ours.foreach { case (id, comp) =>
      if (!edgeNodes.contains(id)) assert(comp === id, s"singleton $id")
    }
  }
}
