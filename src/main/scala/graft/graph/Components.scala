package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an edge list — the clustering step of a
  * near-dedup pipeline (LSH/SimHash near-pairs → duplicate clusters →
  * one canonical doc per cluster; reference builds dup groups only
  * for exact hashes, NewsMarchMarkProcess.scala:23-40).
  *
  * Iterative min-label propagation: every node starts labeled with
  * its own id, and each round every node takes the minimum label
  * among itself and its neighbors. Converges in O(graph diameter)
  * rounds; near-dup graphs are unions of small dense clusters, so
  * the diameter — and the round count — is small in practice.
  *
  * Each round is one join (push labels across edges) plus one
  * aggregation (min per node): two shuffles over (id, label) pairs
  * only, never over document payloads. That is the property that
  * scales — at 100 TB the edge list is the small derivative of the
  * corpus, and label propagation touches nothing else. The loop is
  * driver-controlled but all data stays distributed; the per-round
  * convergence check is a count, not a collect.
  */
object Components {

  /** @param nodes one row per node (singletons become their own
    *              component); @param edges undirected pairs.
    *  Returns (id, comp) with comp = min node id of the component.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .unionByName(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Eager localCheckpoint per round truncates the lineage — the
    // TextRank lesson: without it the round-N plan embeds all N-1
    // previous rounds and Catalyst re-analyzes the whole tree every
    // iteration (quadratic planning, dominates tiny graphs; fatal on
    // big ones). On a real cluster swap for checkpoint() to a
    // reliable store.
    var labels = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val pushed = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp"))
        .unionByName(pushed)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("id"), col("comp").as("prev")), "id")
        .filter(col("comp") < col("prev"))
        .count()
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
