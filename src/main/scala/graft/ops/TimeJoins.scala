package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators the built-in join strategies don't cover
  * directly: as-of joins and interval (range) joins. Both are
  * expressed as compositions Catalyst can plan — a single shuffle
  * for the as-of (union + window), an equi-join for the range join
  * (bucket assignment) — rather than the O(L·R) theta-join a naive
  * `ts >= ts2` condition would plan as a nested-loop.
  */
object TimeJoins {

  /** Left as-of join: each left row picks up the payload of the
    * latest right row with the same key and `right.time <= left.time`
    * (ties at equal time include the right row, matching standard
    * ASOF `>=` semantics). Left rows with no prior right row keep
    * null payload columns.
    *
    * Implementation: tag and union both sides, then one
    * `last(ignoreNulls)` window per key ordered by (time, side) —
    * right rows sort before left rows at equal times. The right
    * payload travels as a single struct so a legitimately-null
    * payload field can never "reach back" to an older right row.
    * One shuffle on the key, no time-range explosion: this shape
    * survives 100 TB because the window is a linear scan within each
    * key partition (skewed keys excepted — salt the key first if one
    * user dominates).
    *
    * Column contract: `left` and `right` share `keyCol` + `timeCol`;
    * their payload column sets must be disjoint.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == timeCol)
    require(rightPayload.nonEmpty, "right side carries no payload columns")
    val overlap = left.columns.toSet.intersect(rightPayload.toSet)
    require(overlap.isEmpty, s"payload column collision: $overlap")

    val rStruct = struct(rightPayload.map(col): _*)
    val rStructType = StructType(
      rightPayload.map(c => right.schema(c.toString)))
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == timeCol)

    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val taggedRight = leftPayload.foldLeft(
      right.select(col(keyCol), col(timeCol), rStruct.as("__r"))
        .withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) :+ col("__r")): _*)
      .select((left.columns.map(col) ++
        rightPayload.map(c => col(s"__r.$c").as(c))): _*)
  }

  /** Interval join via bucketing: rows (a point `valueCol`) against
    * intervals `[loCol, hiCol)`, without an equi-key. Each interval
    * is exploded to the buckets of width `bucketWidth` it covers, each
    * row hashes to exactly one bucket, and the join becomes an
    * equi-join on the bucket id followed by the exact range filter.
    * No duplicate pairs are produced (a point lives in exactly one
    * bucket), so no dedup pass is needed.
    *
    * Scale: comparisons are bounded by interval_span/bucketWidth per
    * interval instead of |rows|·|intervals|; both sides shuffle on
    * the bucket id, so it remains a shuffle-bounded equi-join at
    * 100 TB where a broadcast-nested-loop range join would not fit.
    * Pick `bucketWidth` near the typical interval length (each
    * interval then explodes to ~2 buckets).
    */
  def rangeJoinBucketed(rows: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    rows.withColumn("__bucket",
        floor(col(valueCol) / bucketWidth).cast("long"))
      .join(iv, "__bucket")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
