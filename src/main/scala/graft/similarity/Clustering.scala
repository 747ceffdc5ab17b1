package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation (beyond-reference;
  * the "cluster, then balance/inspect/dedup per cluster" step modern
  * pipelines run between embedding extraction and mixing — SemDeDup
  * clusters before intra-cluster dedup, DoReMi reweights domains
  * that clustering can induce when no domain labels exist).
  *
  * Seeded k-means over an `Array[Float]` embedding column. Like the
  * LDA/Word2Vec fits, a clustering is seeded-deterministic on a
  * fixed cluster but not SQL-replayable, so its queries carry
  * rows-only checks; the spec pins behavior on separable fixtures.
  *
  * Scale: mllib's KMeans is the distributed Lloyd's loop — centroids
  * broadcast each iteration, corpus streams map-side, one aggregate
  * per iteration; assignment afterwards is a scan. Nothing collects
  * to the driver beyond k centroid vectors.
  */
object Clustering {

  /** Cluster assignment per row: (idCol, cluster). */
  def kmeansAssign(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    val vecs = embeddings.select(col(idCol),
      array_to_vector(col(vecCol)).as("__features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("cluster")
      .fit(vecs)
    model.transform(vecs).select(col(idCol), col("cluster"))
  }

  /** Cluster-size histogram — the domain-mixing input a curation
    * run feeds to temperature/DSIR reweighting when no explicit
    * domain labels exist.
    */
  def clusterSizes(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L, maxIter: Int = 20): DataFrame =
    kmeansAssign(embeddings, idCol, vecCol, k, seed, maxIter)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .orderBy(col("cluster"))
}
