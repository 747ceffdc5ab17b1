package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood feature aggregation (the GraphSAGE mean-aggregate
  * shape, Hamilton et al. 2017, without the learned weights) — the
  * graph-side feature engineering a tabular-ML pipeline runs before
  * training: each node's 1-hop mean of neighbor features, then the
  * 2-hop mean-of-means. Means are integer `div` fixed point over
  * fx-quantized features, so both hops replay exactly in SQL.
  *
  * Scale shape: hop k is one (edge ⋈ feature) equi-join + one
  * src-keyed aggregate — the message-passing round every GNN
  * pre-processing system runs, with shuffles keyed by node id and
  * volume O(|E|) per hop. No adjacency ever materializes per node;
  * the symmetrized edge list is the only graph structure touched.
  */
object NeighborAgg {

  /** (node, deg, h1, h2): degree, 1-hop mean of `fxCol` over
    * neighbors, and 2-hop mean of neighbor h1 — both integer-`div`
    * means. `edges` is an undirected pair list; nodes missing from
    * `feats` contribute nothing (inner joins, by contract).
    */
  def twoHopMeans(edges: DataFrame, srcCol: String, dstCol: String,
      feats: DataFrame, nodeCol: String, fxCol: String): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .unionByName(edges
        .select(col(dstCol).as("__s"), col(srcCol).as("__d")))
    val f = feats.select(col(nodeCol).as("__d"), col(fxCol).as("__fx"))
    val h1 = sym.join(f, "__d")
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("deg"), sum(col("__fx")).as("__sf"))
      .withColumn("h1", expr("__sf div deg"))
      .select(col("__s"), col("deg"), col("h1"))
    val h2 = sym
      .join(h1.select(col("__s").as("__d"), col("h1")), "__d")
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n2"), sum(col("h1")).as("__sh"))
      .withColumn("h2", expr("__sh div __n2"))
      .select(col("__s"), col("h2"))
    h1.join(h2, "__s")
      .select(col("__s").as(nodeCol), col("deg"), col("h1"),
        col("h2"))
  }
}
