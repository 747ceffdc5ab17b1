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

  /** SemDeDup (Abbas et al. 2023): semantic deduplication by
    * clustering first, then comparing cosines only WITHIN each
    * cluster — the clustering bounds the all-pairs product at N²/k
    * and makes the pair pass an equi-join on the cluster id that
    * co-partitions both sides (AQE covers a skewed mega-cluster).
    *
    * Assignment here is nearest-of-`nCentroids` fixed centroids (the
    * first `nCentroids` vectors by id — the IVF convention in
    * [[graft.similarity.Ann.ivfTopK]]), which keeps the whole
    * operator deterministic and SQL-replayable; production callers
    * swap in [[kmeansAssign]]'s fitted centroids, the pair logic is
    * identical. Cosines are rounded before any comparison so no
    * verdict hinges on sub-ulp engine differences.
    *
    * A vector is a semantic duplicate iff some LOWER-id vector in
    * its cluster has rounded cosine >= `tau` (keep-lowest-id, the
    * [[graft.dedup.Dedup.exactGroups]] convention). Output:
    * (idCol, cluster, is_dup) for every input vector.
    */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, tau: Double, roundTo: Int = 6): DataFrame = {
    import graft.similarity.{Ann => A}
    val cents = broadcast(embeddings.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cv"),
        A.norm(col(vecCol)).as("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__ccos").desc, col("cent_id"))
    val assigned = embeddings
      .select(col(idCol), col(vecCol).as("v"), A.norm(col(vecCol)).as("vn"))
      .crossJoin(cents)
      .withColumn("__ccos",
        round(A.dot(col("v"), col("cv")) / (col("vn") * col("cn")), roundTo))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(idCol), col("cent_id").as("cluster"),
        col("v"), col("vn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count() // materialize once; both self-join sides read it
    val a = assigned.select(col("cluster"), col(idCol).as("__ida"),
      col("v").as("va"), col("vn").as("na"))
    val b = assigned.select(col("cluster"), col(idCol).as("__idb"),
      col("v").as("vb"), col("vn").as("nb"))
    val dupIds = a.join(b, "cluster")
      .filter(col("__idb") < col("__ida"))
      .filter(round(A.dot(col("va"), col("vb"))
        / (col("na") * col("nb")), roundTo) >= tau)
      .select(col("__ida").as(idCol)).distinct()
      .withColumn("__dup", lit(true))
    assigned.select(col(idCol), col("cluster"))
      .join(dupIds, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }
}
