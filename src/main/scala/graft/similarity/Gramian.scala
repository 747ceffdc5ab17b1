package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Fixed-point Gramian Σ xxᵀ of an embedding column — the input every
  * offline PCA / whitening / linear-probe fit starts from. Element
  * products floor to integer millionths BEFORE the sum, so the d×d
  * upper triangle is exact integers: partition-order independent,
  * SQL-replayable, and bitwise-identical across both forms here.
  *
  * Two twins, one contract:
  *  - [[gramAggregate]] — the declarative oracle surface (q142):
  *    double posexplode → groupBy(i, j). Map-side partial aggregation
  *    collapses the element-pair stream to ≤ d(d+1)/2 keys per
  *    partition, so the shuffle moves ~2080 keys at d=64 — but each
  *    row still GENERATES d²/2 records into the aggregate (~0.5M at
  *    d=1024), which is where the constant factor lives.
  *  - [[gramBlas]] — the per-partition BLAS-style accumulate: one
  *    flat Array[Long] of the upper triangle per partition, a tight
  *    j-loop over each vector (no per-element record, no Generate),
  *    then an element-wise treeReduce of numPartitions arrays. The
  *    only data movement is the d(d+1)/2-long partial per partition —
  *    at d=1024 that is 4.2 MB/partition regardless of row count,
  *    the right shape for a 100 TB corpus scan.
  *
  * The reduced triangle is a bounded trained artifact (d²/2 longs on
  * the driver — 4.2 MB at d=1024), the same contract as
  * [[graft.feature.NaiveBayes.fitCompact]]'s collect.
  */
object Gramian {

  /** Declarative aggregate form — the q142 oracle surface. */
  def gramAggregate(df: DataFrame, vecCol: String): DataFrame =
    df.select(col(vecCol).as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(floor(lit(1e6) *
        (col("xi").cast("double") * col("xj").cast("double"))))
        .as("gram_fx"))

  /** BLAS-style mapPartitions form: exact-integer equal to
    * [[gramAggregate]] (same per-element floor, and longs add
    * associatively) with no Generate in the plan. Requires every
    * vector to share one dimensionality d.
    */
  def gramBlas(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(col(vecCol)).rdd.mapPartitions { it =>
      var acc: Array[Long] = null
      var d = -1
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        if (acc == null) {
          d = v.length
          acc = new Array[Long](d * (d + 1) / 2)
        }
        require(v.length == d,
          s"gramBlas: mixed dimensionality (${v.length} vs $d)")
        var i = 0
        var idx = 0
        while (i < d) {
          val xi = v(i).toDouble
          var j = i
          while (j < d) {
            acc(idx) += math.floor(1e6 * (xi * v(j).toDouble)).toLong
            idx += 1
            j += 1
          }
          i += 1
        }
      }
      if (acc == null) Iterator.empty else Iterator((d, acc))
    }
    if (partials.isEmpty())
      return spark.emptyDataset[(Int, Int, Long)]
        .toDF("i", "j", "gram_fx")
    val (d, tri) = partials.treeReduce { case ((d1, a1), (d2, a2)) =>
      require(d1 == d2, s"gramBlas: mixed dimensionality ($d1 vs $d2)")
      var i = 0
      while (i < a1.length) { a1(i) += a2(i); i += 1 }
      (d1, a1)
    }
    val rows = Seq.newBuilder[(Int, Int, Long)]
    var i = 0
    var idx = 0
    while (i < d) {
      var j = i
      while (j < d) { rows += ((i, j, tri(idx))); idx += 1; j += 1 }
      i += 1
    }
    rows.result().toDF("i", "j", "gram_fx")
  }
}
