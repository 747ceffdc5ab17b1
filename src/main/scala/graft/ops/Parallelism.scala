package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Scan-parallelism repair for expensive per-row kernels (guide §2.5
  * input-skew rule): the sf test tables are single-row-group parquet
  * files Spark cannot split, so a tokenize/hash/signature kernel
  * directly downstream of such a scan runs on 1-2 cores while the
  * rest idle. [[widen]] hash-repartitions on a DETERMINISTIC key
  * (never round-robin — task retries must reproduce the same row
  * placement, SPARK-38388) and only ever widens: input already at
  * ≥ defaultParallelism partitions passes through untouched, so a
  * well-partitioned production corpus pays nothing.
  */
object Parallelism {

  def widen(df: DataFrame, keyCol: String): DataFrame =
    widen(df, col(keyCol))

  /** Column form — for inputs without a natural id column the key
    * may be any deterministic expression of the row (hash
    * partitioning supports arrays and structs).
    */
  def widen(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
