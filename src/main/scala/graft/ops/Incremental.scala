package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the 100 TB answer to "the
  * nightly rollup": never re-aggregate the base corpus when a delta
  * batch lands. Keep a small per-group STATE table of mergeable
  * partials (count / sum / min / max — every metric here is a
  * commutative monoid), aggregate ONLY the delta, and merge states;
  * the merge touches state-table-sized data (groups, not rows), so
  * the cost of an update is proportional to the batch, not the
  * corpus. This is the same partial-aggregate algebra Spark's own
  * partial+final `HashAggregate` pairs use inside one query,
  * promoted to a cross-batch artifact.
  *
  * Values are aggregated in fx space (`floor(v*100)` longs), so
  * sums are exact and merge order can never change a result —
  * floating sums would drift with batch arrival order, turning the
  * maintained rollup away from the from-scratch one bit by bit.
  * The q175 oracle asserts exactly that equivalence: the merged
  * state FINISHED equals the from-scratch aggregate over the union.
  */
object Incremental {

  private def fx(c: org.apache.spark.sql.Column) =
    floor(c * 100).cast("long")

  /** The mergeable per-group state of one batch. */
  def aggState(df: DataFrame, groupCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(fx(col(valCol))).as("sum_fx"),
        min(fx(col(valCol))).as("min_fx"),
        max(fx(col(valCol))).as("max_fx"))

  /** Merge any number of state tables (all four metrics are
    * monoids: counts and sums add, min/max fold). Associative and
    * commutative, so batches may land in any order or grouping.
    */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    val groupCol = states.head.columns.head
    states.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_fx")).as("sum_fx"),
        min(col("min_fx")).as("min_fx"),
        max(col("max_fx")).as("max_fx"))
  }

  /** Derive the presentation metrics from a state table (the only
    * non-mergeable column, computed last): integer mean in fx space.
    */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("avg_fx", expr("sum_fx div n"))
}
