package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout — the STORAGE-side answer to repeated
  * large-×-large equi-joins (SURVEY §2.8's co-location row). Both
  * sides are written pre-hashed into the same number of buckets on
  * the join key (and sorted within buckets), so every later join on
  * that key is EXCHANGE-free: the scan itself satisfies the join's
  * clustering requirement. A partition-local Sort remains in the
  * plan — Spark 3+ ignores bucket sort metadata unless
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` is set — but
  * it is per-bucket, spill-free, and does not move data; eliminating
  * the shuffle is the scale win.
  *
  * At 100 TB this is the difference between shuffling both fact
  * tables on EVERY join and shuffling each once at ingest: the
  * bucket layout is paid when data lands and amortized over every
  * downstream join/aggregate on the bucket key. Spark only uses
  * bucket metadata through the catalog (`spark.table`), not raw
  * path reads — hence `saveAsTable` with an explicit external path.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table. The
    * `repartition(buckets, key)` before the write aligns write tasks
    * with bucket hashing (same Murmur3 hash both sides), producing
    * exactly ONE file per bucket — the layout whose sort metadata
    * the reader can actually use.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(buckets, col(key))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)
  }

  /** Exchange-free equi-join of two tables previously written by
    * [[writeBucketed]] with the SAME bucket count on the join keys.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        col(leftKey) === col(rightKey))
}
