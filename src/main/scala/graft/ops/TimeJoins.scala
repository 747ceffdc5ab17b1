package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

    val rStruct = struct(rightPayload.toSeq.map(col): _*)
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
      .select((left.columns.toSeq.map(col) :+ col("__r")): _*)
      .select((left.columns.toSeq.map(col) ++
        rightPayload.map(c => col(s"__r.$c").as(c))): _*)
  }

  /** Hot-key variant of [[asofJoin]]: the window partitions by
    * (key, time-bucket) instead of key, so one dominant key no longer
    * serializes into a single task — its timeline is processed as
    * parallel bucket slices. Matches that cross a bucket boundary are
    * restored by a carry-in pass: the latest right row per
    * (key, bucket) — one row per bucket, tiny — is prefix-scanned per
    * key and joined back to left rows whose in-bucket window found
    * nothing. Results are identical to [[asofJoin]] (property-tested
    * in TimeJoinsSpec); the trade is two extra small shuffles for
    * per-bucket parallelism on the big side.
    *
    * `timeCol` must be a timestamp; `bucketWidth` is its slicing
    * granularity in seconds. Precondition (same as [[asofJoin]]'s
    * tiebreak determinism): (key, time) unique on the right side.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == timeCol)
    require(rightPayload.nonEmpty, "right side carries no payload columns")
    val overlap = left.columns.toSet.intersect(rightPayload.toSet)
    require(overlap.isEmpty, s"payload column collision: $overlap")

    def bucketOf(c: Column): Column =
      floor(unix_micros(c) / (bucketWidthSec * 1000000L)).cast("long")

    val rStruct = struct(rightPayload.toSeq.map(col): _*)
    val rStructType = StructType(rightPayload.map(c => right.schema(c)))
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == timeCol)

    val lb = left.withColumn("__b", bucketOf(col(timeCol)))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val rb = leftPayload.foldLeft(
      right.select(col(keyCol), col(timeCol), rStruct.as("__r"))
        .withColumn("__b", bucketOf(col(timeCol)))
        .withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    // in-bucket as-of: the only shuffle the full data volume pays,
    // partitioned by (key, bucket)
    val wIn = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = lb.unionByName(rb)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(wIn))
      .filter(col("__side") === 1)

    // carry-in: latest right row per (key, bucket) — one row per
    // bucket — prefix-scanned per key over strictly-earlier buckets
    val rLast = right
      .withColumn("__b", bucketOf(col(timeCol)))
      .groupBy(col(keyCol), col("__b"))
      .agg(max_by(rStruct, col(timeCol)).as("__rl"))
    val spine = inBucket.select(col(keyCol), col("__b")).distinct()
      .unionByName(rLast.select(col(keyCol), col("__b"))).distinct()
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine
      .join(rLast, Seq(keyCol, "__b"), "left")
      .withColumn("__carry", last(col("__rl"), ignoreNulls = true).over(wCarry))
      .select(col(keyCol), col("__b"), col("__carry"))

    inBucket
      .join(carry, Seq(keyCol, "__b"), "left")
      .withColumn("__r", coalesce(col("__r"), col("__carry")))
      .select((left.columns.toSeq.map(col) ++
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
