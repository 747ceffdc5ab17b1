package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer OLS trend fitting per group — "is this metric
  * drifting up or down, and from where" as one aggregate pass, the
  * regression companion to the distribution-drift gate
  * (`Profiler.chiSquareDrift`) and the grouped higher moments (q99).
  *
  * The closed-form slope/intercept
  *
  *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
  *
  * is computed entirely in decimal-widened INTEGER arithmetic on
  * fixed-point inputs, so the fit replays bit-for-bit in SQL — the
  * same no-logarithm/no-float discipline as the χ² scores (q171,
  * q184). Two portability guards:
  *
  *   - x is centered on the per-group minimum before the moment
  *     sums, so Σx² carries the data WINDOW's magnitude, not the
  *     epoch's — without this, (n·Σxy)²-scale terms overflow even
  *     128-bit arithmetic on epoch-second x.
  *   - every integer division runs on a non-negative numerator
  *     (abs, sign re-applied after): Spark's `div` truncates toward
  *     zero while other engines' `//` may floor, and the two
  *     disagree exactly on negative quotients.
  *
  * Scale shape: one bounded min-aggregate broadcast back onto the
  * stream, then ONE partial+final aggregate carrying all five moment
  * sums — group count rows out, no window, no second scan of the
  * data. Magnitude contract: with x centered (span w) the largest
  * intermediate is n·Σ|xy|·10⁹ ≈ n²·w·|y|·10⁹, inside decimal(38,0)
  * for n·√w·|y| up to ~10¹⁴·⁵ — beyond that, coarsen x (e.g. minutes
  * instead of seconds) or pre-aggregate per time bucket first.
  */
object Trend {

  /** Per-group OLS of `yCol` (long, fixed-point) on `xCol` (long).
    * Output: (group, n, slope_e9, intercept_fx_e2) where slope_e9 is
    * the slope in y-units per x-unit ×10⁹ and intercept_fx_e2 the
    * y-intercept AT THE GROUP's x-minimum ×10², both truncated
    * toward zero; NULL when the group's x is constant (n=1 or all
    * equal — the fit is undefined, and both engines must say so
    * rather than divide by zero).
    */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x0 = df.groupBy(col(groupCol))
      .agg(min(col(xCol)).as("__x0"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val agg = df.join(broadcast(x0), groupCol)
      .withColumn("__x", col(xCol) - col("__x0"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("__x"))).as("__sx"),
        sum(dec(col(yCol))).as("__sy"),
        sum(dec(col("__x")) * col(yCol)).as("__sxy"),
        sum(dec(col("__x")) * col("__x")).as("__sxx"))
    agg
      .withColumn("__num",
        dec(col("n")) * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__denx",
        dec(col("n")) * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__inum",
        col("__sy") * col("__sxx") - col("__sx") * col("__sxy"))
      .select(col(groupCol), col("n"),
        expr("CASE WHEN __denx = 0 THEN NULL ELSE" +
          " (CASE WHEN __num < 0 THEN -1L ELSE 1L END)" +
          " * (abs(__num) * 1000000000 div __denx) END").as("slope_e9"),
        expr("CASE WHEN __denx = 0 THEN NULL ELSE" +
          " (CASE WHEN __inum < 0 THEN -1L ELSE 1L END)" +
          " * (abs(__inum) * 100 div __denx) END").as("intercept_fx_e2"))
      .orderBy(col(groupCol))
  }
}
