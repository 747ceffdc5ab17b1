package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Relational building blocks (SURVEY.md §2.2–§2.6, §2.8).
  *
  * The reference expresses several of these through weaker idioms
  * (marker-column joins, filter+limit+union class balancing, RDD
  * zipWithIndex); here each is the first-class Spark operator so
  * Catalyst can plan it (anti/semi joins get broadcast or
  * sort-merge strategies, window top-k gets a single shuffle).
  */
object Relational {

  /** Left-anti join — replaces the reference's left-join +
    * `filter("dupmark is null")` idiom
    * (NewsMarchMarkPreProcess.scala:46-54, BrowserCategory.scala:41).
    */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Left-semi join — replaces left-join + `filter("x is not null")`
    * (ReadAppPortrait.scala:110-111).
    */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Corrected-rows replacement (BrowserCategory.scala:28-42):
    * corrections win over base rows with the same key.
    */
  def unionCorrected(base: DataFrame, corrections: DataFrame,
      keys: Seq[String]): DataFrame =
    antiJoin(base, corrections.select(keys.map(col): _*), keys)
      .unionByName(corrections)

  /** Top-k rows per group by explicit order — the scalable form of
    * the reference's per-class `filter(...).limit(n)` + union chains
    * (NewsMarchSubCategoryTrainProcess.scala:67-70): one shuffle on
    * the group key instead of one job per class.
    * Callers must include a tiebreaker in `order` for determinism.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
      order: Seq[Column], k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
      .drop(rankCol)
  }

  /** Class balancing: at most `cap` rows per class, deterministic. */
  def classBalance(df: DataFrame, classCol: String, cap: Int,
      tiebreak: Seq[Column]): DataFrame =
    topKPerGroup(df, Seq(col(classCol)), tiebreak, cap)

  /** Contiguous, gapless, 1-based row ids — the reference's
    * `dfZipWithIndex` (ArticleInfoProcess.scala:17-36, duplicated
    * 4×). `monotonically_increasing_id` is gapped and `row_number`
    * over an empty window funnels everything through one partition,
    * so for scale we sort (distributed) and use RDD `zipWithIndex`
    * (one extra count-per-partition job, no single-partition
    * bottleneck).
    *
    * Determinism requires `sortCols` to be a total order.
    */
  def zipWithIndex(df: DataFrame, idColName: String,
      sortCols: Seq[Column]): DataFrame = {
    val sorted = if (sortCols.nonEmpty) df.orderBy(sortCols: _*) else df
    val schema = StructType(
      StructField(idColName, LongType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq((idx + 1L) +: row.toSeq)
    }
    sorted.sparkSession.createDataFrame(rows, schema)
  }

  /** Composite business id from concatenated key fields
    * (ArticleInfoProcess.scala:79) — hashed so the id is
    * fixed-width and join-friendly at 100 TB.
    */
  def compositeId(df: DataFrame, cols: Seq[String],
      outCol: String = "composite_id", sep: String = "|"): DataFrame =
    df.withColumn(outCol, md5(concat_ws(sep, cols.map(col): _*)))

  /** Exact dedup on a key subset keeping the first row by an
    * explicit order — deterministic, unlike bare `dropDuplicates`
    * which keeps an arbitrary row per key.
    */
  def dedupExact(df: DataFrame, keys: Seq[String],
      keepOrder: Seq[Column]): DataFrame =
    topKPerGroup(df, keys.map(col), keepOrder, 1)
}
