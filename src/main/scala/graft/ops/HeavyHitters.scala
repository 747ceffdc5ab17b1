package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Certified heavy hitters in bounded memory — per-partition
  * Misra-Gries summaries, then an exact recount of the surviving
  * candidates (Misra & Gries 1982; the two-phase shape is the
  * standard scale-out deployment of the sketch).
  *
  * Why not a plain groupBy-count? At 100 TB a full (key, count)
  * aggregate shuffles EVERY distinct key — billions of group keys
  * for a top-handful question. Here each partition keeps at most
  * `capacity` counters, the union of candidates is ≤
  * partitions×capacity keys (broadcastable), and only those keys are
  * exactly recounted.
  *
  * The certification is what makes the result oracle-verifiable
  * rather than approximate: if a key's global count satisfies
  * count × capacity > N, then on at least one partition its local
  * count exceeds n_p/capacity (otherwise summing the per-partition
  * bounds gives count ≤ N/capacity), and Misra-Gries never evicts
  * such a key from that partition's summary. So the candidate union
  * provably contains EVERY certified heavy hitter, the exact recount
  * filters precisely, and the output equals the plain
  * `HAVING count × capacity > N` aggregate bit-for-bit — which is
  * exactly the SQL the q162 oracle runs. All comparisons are
  * integer (`n * capacity > total`), no float threshold exists.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries candidate keys (long keys). Each
    * partition emits at most `capacity` keys; duplicates across
    * partitions are collapsed. Counts are NOT emitted — MG counts
    * are lower bounds and the exact phase recounts anyway.
    */
  def candidates(keyed: Dataset[java.lang.Long],
      capacity: Int): Dataset[java.lang.Long] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    import keyed.sparkSession.implicits._
    keyed.mapPartitions { it =>
      // boxed values on purpose: a primitive-valued scala type param
      // would auto-unbox get()'s absent-key null to 0 and break the
      // containment check silently
      val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      while (it.hasNext) {
        val x = it.next()
        val cur: java.lang.Long = counts.get(x)
        if (cur ne null) counts.put(x, cur + 1L)
        else if (counts.size < capacity) counts.put(x, 1L)
        else {
          // decrement-all eviction: every counter loses one; zeros drop
          val entries = counts.entrySet().iterator()
          while (entries.hasNext) {
            val e = entries.next()
            if (e.getValue.longValue == 1L) entries.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      scala.jdk.CollectionConverters
        .SetHasAsScala(counts.keySet()).asScala.iterator
    }.distinct()
  }

  /** The full certified pipeline: keys whose exact global count
    * satisfies count × capacity > N, with their exact counts.
    * Output: (keyCol, n) ordered (n desc, key asc). `keyCol` must be
    * integral (the sketch runs on longs).
    */
  def certified(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
      .contains(df.schema(keyCol).dataType),
      s"heavy-hitter sketch needs an integral key, got $keyCol")
    import df.sparkSession.implicits._
    val keyed = df.select(col(keyCol).cast("long")
      .as[java.lang.Long](org.apache.spark.sql.Encoders.LONG))
    val cands = candidates(keyed, capacity).toDF(keyCol)
    val total = df.select(count(lit(1)).as("__total"))
    df.select(col(keyCol))
      .join(broadcast(cands), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * capacity > col("__total"))
      .select(col(keyCol), col("n"))
      .orderBy(col("n").desc, col(keyCol))
  }
}
