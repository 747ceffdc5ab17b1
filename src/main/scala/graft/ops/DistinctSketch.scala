package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * cardinality estimator (Bar-Yossef et al. 2002; the k-th smallest
  * hash of a uniformly hashed set estimates its size as
  * (k-1)·H / h_k for hash space H).
  *
  * Why not count(DISTINCT)? At 100 TB the exact form shuffles every
  * distinct key; the sketch keeps k longs per partition (a bounded
  * map-side pass, same discipline as [[HeavyHitters]]), merges
  * ≤ partitions×k values, and reads one number off the k-th
  * order statistic. Unlike HyperLogLog it is EXACTLY deterministic
  * given the hash — no engine-private bias correction — so the whole
  * estimate replays in SQL and q164 carries a full hash oracle: the
  * "approximation" is a pure integer function of the data.
  *
  * Hash: the project's cross-engine md5-prefix idiom widened to 48
  * bits (12 hex chars — exact in a BIGINT on both engines; at real
  * corpus scale you'd widen to the full 64 via two prefixes, same
  * idiom). Estimate: (k−1)·2^48 div h_k, truncating division on both
  * sides. If fewer than k distinct hashes exist the sketch saw
  * everything and reports the exact count.
  */
object DistinctSketch {

  val HashSpace: Long = 1L << 48

  /** 48-bit cross-engine hash of the key's string form. */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Bounded per-partition k-smallest DISTINCT hash values — at most
    * k longs leave each partition.
    */
  private[ops] def partitionMins(hashes: DataFrame, k: Int): DataFrame = {
    import hashes.sparkSession.implicits._
    hashes.select(col("__h")
      .as[java.lang.Long](org.apache.spark.sql.Encoders.LONG))
      .mapPartitions { it =>
        val set = new java.util.TreeSet[java.lang.Long]()
        while (it.hasNext) {
          val h = it.next()
          set.add(h)
          if (set.size > k) set.remove(set.last)
        }
        scala.jdk.CollectionConverters
          .SetHasAsScala(set).asScala.iterator
      }.toDF("__h")
  }

  /** The KMV cardinality report for `keyCol`:
    * (k_used, h_k, est_distinct) — all exact integers.
    */
  def kmv(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 1, s"KMV needs k > 1, got $k")
    val hashes = df.select(hash48(col(keyCol)).as("__h"))
    val mins = partitionMins(hashes, k)
      .distinct()
      .orderBy(col("__h"))
      .limit(k)
    mins.agg(count(lit(1)).as("k_used"), max(col("__h")).as("h_k"))
      .select(col("k_used"), col("h_k"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(s"(k_used - 1) * ${HashSpace}L div h_k"))
          .as("est_distinct"))
  }
}
