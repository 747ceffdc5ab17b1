package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line concurrency — "how many sessions were active
  * at once, and when did the peak happen": the capacity-planning
  * readout over any interval relation (sessions, jobs, rentals).
  * Intervals are INCLUSIVE at both ends and the sweep orders +1
  * deltas before −1 at equal timestamps, so touching intervals
  * overlap — the convention stated once and replayed exactly.
  *
  * Scale shape: the sweep runs over 2·|intervals| delta rows — the
  * SESSION-bounded relation, not the event stream — so the global
  * running-sum window is the documented bounded-single-partition
  * shape (the W2 vocab-indexer contract), fine for millions of
  * intervals and NOT for billions; shard by calendar day first at
  * that scale (peaks don't cross a shard boundary if shards overlap
  * by the max session length).
  */
object Concurrency {

  /** One row: (n_intervals, peak, peak_at_us) — the peak concurrent
    * count and the EARLIEST microsecond it is reached. The peak and
    * its time are invariant to tie-order among equal (t, delta)
    * rows: +1s sort first, so the within-tie maximum is the sum
    * after all the tie's arrivals, whatever their permutation.
    */
  def peakConcurrency(intervals: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val d = intervals
      .select(unix_micros(col(startCol)).as("t"), lit(1L).as("delta"))
      .unionByName(intervals
        .select(unix_micros(col(endCol)).as("t"),
          lit(-1L).as("delta")))
    val sweep = Window.orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val r = d.withColumn("running", sum(col("delta")).over(sweep))
    val peak = r.agg(max(col("running")).as("peak"))
    r.crossJoin(broadcast(peak))
      .filter(col("running") === col("peak"))
      .agg(min(col("t")).as("peak_at_us"),
        max(col("peak")).as("peak"))
      .crossJoin(broadcast(
        intervals.agg(count(lit(1)).as("n_intervals"))))
      .select(col("n_intervals"), col("peak"), col("peak_at_us"))
  }
}
