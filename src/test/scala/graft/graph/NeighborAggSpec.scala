package graft.graph

import graft.SparkSpec

class NeighborAggSpec extends SparkSpec {
  import spark.implicits._

  test("twoHopMeans computes hand-checked integer-div means") {
    // star: 1 joined to 2,3,4; plus edge 2-3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
      .toDF("s", "d")
    val feats = Seq((1L, 10L), (2L, 20L), (3L, 40L), (4L, 90L))
      .toDF("n", "fx")
    val got = NeighborAgg.twoHopMeans(edges, "s", "d", feats, "n", "fx")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // h1: node1 = (20+40+90)/3 = 50; node2 = (10+40)/2 = 25;
    //     node3 = (10+20)/2 = 15; node4 = 10/1 = 10
    // h2: node1 = (25+15+10)/3 = 16 (integer div of 50);
    //     node2 = (50+15)/2 = 32; node3 = (50+25)/2 = 37; node4 = 50
    assert(got(1L) == ((3L, 50L, 16L)))
    assert(got(2L) == ((2L, 25L, 32L)))
    assert(got(3L) == ((2L, 15L, 37L)))
    assert(got(4L) == ((1L, 10L, 50L)))
  }

  test("nodes without features contribute nothing (inner-join contract)") {
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val feats = Seq((1L, 10L), (2L, 30L)).toDF("n", "fx") // 3 missing
    val got = NeighborAgg.twoHopMeans(edges, "s", "d", feats, "n", "fx")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // node1's h1 sees only node2's feature; deg counts featured
    // neighbors only
    assert(got(1L) == ((1L, 30L, 10L)))
  }
}
