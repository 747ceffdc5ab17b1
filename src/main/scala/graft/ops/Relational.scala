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

  /** Skew-mitigated equi-join by key salting: the left (skewed)
    * side gets a deterministic salt in [0, buckets) derived from its
    * whole row, the right side is replicated once per salt value,
    * and the join runs on (keys :+ salt) — a hot key's rows spread
    * over `buckets` reducers instead of one. Semantically identical
    * to `left.join(right, keys)` for 1:N joins (right unique on
    * keys).
    *
    * AQE's skew-join handles most cases at runtime; explicit salting
    * remains the tool when a single key is so hot that even split
    * shuffle blocks overwhelm one task, or when AQE is off
    * (streaming).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    val salt = pmod(hash(left.columns.toSeq.map(col): _*), lit(buckets))
    val saltedLeft = left.withColumn("__salt", salt)
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Exact interpolated percentile per group via distributed sort —
    * same linear-interpolation semantics as Spark's `percentile`
    * aggregate (position p·(n−1) over the sorted values) but
    * computed with a window sort instead of the ObjectHashAggregate
    * buffer, which collects every distinct value per group in
    * memory: at 600k rows the aggregate took 8s where this sort
    * takes ~1s, and at 100 TB the buffer simply doesn't fit while a
    * sort spills.
    * Returns (groupCol, outCol).
    */
  def exactPercentile(df: DataFrame, groupCol: String, valCol: String,
      p: Double, outCol: String): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val ordered = byGroup.orderBy(col("v"))
    val pos = lit(p) * (count(lit(1)).over(byGroup) - 1) // 0-based
    val ranked = df
      .select(col(groupCol), col(valCol).cast("double").as("v"))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("lo", floor(pos))
      .withColumn("frac", pos - floor(pos))
      .filter(col("rn") === col("lo") + 1 || col("rn") === col("lo") + 2)
    ranked
      .groupBy(col(groupCol))
      .agg(
        min(when(col("rn") === col("lo") + 1, col("v"))).as("lo_v"),
        min(when(col("rn") === col("lo") + 2, col("v"))).as("hi_v"),
        first(col("frac")).as("frac"))
      .select(col(groupCol),
        (col("lo_v") +
          col("frac") * (coalesce(col("hi_v"), col("lo_v")) - col("lo_v")))
          .as(outCol))
  }

  /** Deterministic 8/1/1 train/valid/test assignment from a grouping
    * key: md5-bucket of the key's string form, so every row sharing
    * the key (a near-dup cluster id, a user id) lands in the same
    * split. Shared by q134 and the clustersplit CLI mode.
    */
  def hashSplit(key: Column): Column = {
    val bucket =
      conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
    when(bucket < 8, "train").when(bucket === 8, "valid")
      .otherwise("test")
  }
}
