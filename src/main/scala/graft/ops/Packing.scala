package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the training-data layout step
  * that concatenates documents in a fixed order and cuts the stream
  * into fixed-capacity context windows (every doc lands at a
  * deterministic offset; docs may straddle a window boundary).
  *
  * Packing is computed per shard (`shardCol`): a prefix sum over a
  * window partitioned by shard, so the single shuffle is by shard key
  * and shards pack in parallel. Never pack globally — a single
  * unpartitioned window serializes the corpus through one task; at
  * scale the shard is the unit real pipelines pack within anyway.
  */
object Packing {

  /** Adds `start_off` (token offset of the doc within its shard's
    * concatenated stream), `pack_first` and `pack_last` (the context
    * windows of `capacity` tokens the doc spans). Requires
    * `nTokensCol > 0` for every row.
    */
  def packSpans(df: DataFrame, shardCol: String, orderCol: String,
      nTokensCol: String, capacity: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("start_off",
        (sum(col(nTokensCol)).over(w) - col(nTokensCol)).cast("long"))
      .withColumn("pack_first", floor(col("start_off") / capacity))
      .withColumn("pack_last",
        floor((col("start_off") + col(nTokensCol) - 1) / capacity))
  }
}
