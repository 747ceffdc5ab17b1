package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the quality gate a 100 TB ingest runs
  * BEFORE trusting a new drop of data: per-column null rates,
  * cardinalities and ranges, plus an equi-width histogram for
  * distribution drift checks.
  *
  * Scale shape: [[profile]] is ONE scan — every per-column metric is
  * an aggregate in a single `agg(...)`, unpivoted afterwards with
  * `stack` over the 1-row result (cols × 6 longs; never a second
  * pass, never a per-column job like a naive profiler loop).
  * The exact `countDistinct` set is the one genuinely heavy metric
  * (Spark plans the multi-distinct via Expand: the scan is still
  * read once but the shuffle carries each row ~cols times);
  * [[approxProfile]] swaps in HLL `approx_count_distinct`, which
  * partial-aggregates map-side and shuffles only fixed-size sketches
  * — the form to run at 100 TB, spec-bounded against exact on the
  * test corpus. Money-like doubles are profiled in fx space
  * (`floor(v*100)` longs) so min/max are engine-portable integers.
  */
object Profiler {

  private def fx(c: Column): Column = floor(c * 100).cast("long")

  private def unpivot(one: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c =>
      s"'$c', __rows, __n_$c, __rows - __n_$c, __d_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_present, n_null, n_distinct, min_fx, max_fx)")
      .orderBy(col("col_name"))
  }

  /** Exact one-pass profile of numeric columns: row count, non-null
    * count, null count, exact distinct count, fx-space min/max.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(fx(col(c))).as(s"__min_$c"),
        max(fx(col(c))).as(s"__max_$c"))
    }
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** The 100 TB form: identical shape with HLL sketches for the
    * distinct counts — map-side partials, fixed-size shuffle.
    */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        approx_count_distinct(col(c), rsd).as(s"__d_$c"),
        min(fx(col(c))).as(s"__min_$c"),
        max(fx(col(c))).as(s"__max_$c"))
    }
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** Equi-width histogram over `c` in fx space: min/max from a 1-row
    * broadcast aggregate (the stats-then-sweep two-pass every layout
    * / binning operator shares), bucket by EXACT integer arithmetic
    * — `(fx - mn) * buckets div (mx - mn + 1)` lands in
    * 0..buckets-1 with no clamp and no floats, so any engine
    * reproduces the binning bit-for-bit. One shuffle of ≤ `buckets`
    * partial rows.
    */
  def histogramFx(df: DataFrame, c: String, buckets: Int): DataFrame = {
    val stats = df.agg(min(fx(col(c))).as("__mn"), max(fx(col(c))).as("__mx"))
    df.select(fx(col(c)).as("__fx"))
      .crossJoin(broadcast(stats))
      .withColumn("bucket",
        expr(s"((__fx - __mn) * $buckets) div (__mx - __mn + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__fx")).as("lo_fx"), max(col("__fx")).as("hi_fx"))
      .orderBy(col("bucket"))
  }
}
