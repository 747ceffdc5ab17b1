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

  /** GLOBAL concat-and-chunk packing — the case [[packSpans]]'s
    * contract forbids (no shard column; ONE corpus-wide stream, the
    * single-corpus pretraining layout). Same output columns, but the
    * corpus-wide prefix sum is two-level (the q126 budget-select
    * shape): rows band by `orderCol` range, per-band token totals
    * (one small aggregate, one row per band) carry across bands
    * through a window over band rows only, and the corpus pays one
    * hashpartitioning exchange on the band id plus a within-band
    * window. The naive `Window.orderBy(orderCol)` cumulative — which
    * sorts the whole corpus through ONE task — never appears;
    * PackingSpec pins exact equality with it and with [[packSpans]]
    * under a constant shard.
    *
    * `orderCol` must be numeric and unique (doc ids); `bandWidth`
    * slices its value range, so band count tracks id range /
    * bandWidth — size it to give each band ~10⁵-10⁶ rows at scale.
    */
  def packSpansGlobal(df: DataFrame, orderCol: String,
      nTokensCol: String, capacity: Int,
      bandWidth: Long = 1000L): DataFrame = {
    require(capacity > 0 && bandWidth > 0,
      "capacity and bandWidth must be > 0")
    val withB = df.withColumn("__b",
      floor(col(orderCol) / bandWidth.toDouble).cast("long"))
    val carryW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = withB.groupBy(col("__b"))
      .agg(sum(col(nTokensCol)).as("__bt"))
      .withColumn("__carry", coalesce(sum(col("__bt")).over(carryW), lit(0L)))
      .select(col("__b"), col("__carry"))
    val inBand = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(carries), "__b")
      .withColumn("start_off",
        (col("__carry") + sum(col(nTokensCol)).over(inBand) -
          col(nTokensCol)).cast("long"))
      .withColumn("pack_first", floor(col("start_off") / capacity))
      .withColumn("pack_last",
        floor((col("start_off") + col(nTokensCol) - 1) / capacity))
      .drop("__b", "__carry")
  }
}
