package graft.graph

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step of a
  * near-dedup pipeline (LSH/SimHash near-pairs → duplicate clusters →
  * one canonical doc per cluster; reference builds dup groups only
  * for exact hashes, NewsMarchMarkProcess.scala:23-40).
  *
  * Union-find edge contraction instead of driver-iterated label
  * propagation. Each contraction round hash-partitions the edge list
  * by node, runs an in-partition union-find (path compression, union
  * by min id), and emits the partition's spanning star — one
  * (node, local-min-root) edge per distinct node. Stars overlapping
  * on a node land in the same partition next round (the key IS the
  * node), so each round both shrinks the edge set (≤ one edge per
  * distinct node per partition) and geometrically reduces the
  * partition count until one partition holds the fully contracted
  * graph; a final local union-find there yields exact components.
  *
  * Why not a join-per-round label loop: every round of it is a fresh
  * Catalyst plan (2-4 joins), a checkpoint action, and a convergence
  * action — on a near-dup graph the data cost is trivial and the
  * driver round-trips dominate (measured ~1.5 s/round at sf0.1).
  * Contraction is ONE lazy plan: log_fanIn(P) shuffles of (long,
  * long) pairs and no driver iteration at all.
  *
  * Scale argument: the edge list is what LSH/SimHash banding emitted
  * — orders of magnitude smaller than the corpus — and each round's
  * output is bounded by the number of distinct nodes per partition,
  * so the contracted graph shrinks toward the number of clusters.
  * The single-partition final merge sees one edge per distinct
  * (partition, node) of the previous round — for a billion-node edge
  * set raise `fanIn` rounds (each is one shuffle) until the tail
  * fits; the union-find itself is O(E α(E)) with two longs per node
  * of state. Deterministic throughout: roots are min ids, no
  * ordering sensitivity.
  */
object Components {

  /** @param nodes one row per node (singletons become their own
    *              component); @param edges undirected pairs.
    *  @param fanIn how many partitions each contraction round folds
    *               into one (rounds = ceil(log_fanIn(P))).
    *  Returns (id, comp) with comp = min node id of the component.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      fanIn: Int = 32): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._

    // Contract within the input's own partitions first — the first
    // shuffle then moves per-partition spanning stars, never the raw
    // edge list.
    var cur: Dataset[(Long, Long)] = edges
      .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions(localStar)
    var parts = spark.sessionState.conf.numShufflePartitions
    while (parts > 1) {
      parts = math.max(1, parts / math.max(2, fanIn))
      cur = cur.repartition(parts, col("_1"))
        .mapPartitions(localStar)
    }
    val comp = cur.toDF("id", "comp")

    // Attach singletons: comp defaults to the node's own id.
    nodes.select(col(idCol).cast("long").as("id")).distinct()
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** In-partition union-find: consume the edge iterator, return one
    * (node, root) pair per distinct node — the partition's spanning
    * star. Root = min node id of the local set (union by min keeps
    * the invariant; path compression keeps finds near-O(1)).
    */
  private def localStar(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    it.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    parent.keysIterator.map(n => (n, find(n))).toArray.iterator
  }
}
