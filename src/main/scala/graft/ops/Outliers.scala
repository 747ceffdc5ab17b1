package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-wise robust outlier gate — the Tukey-fence cleaning pass a
  * feed runs per slice before trusting aggregates: values outside
  * [Q1 − 1.5·IQR, Q3 + 1.5·IQR] flagged per group, with the fences
  * computed from that group's own distribution (a global fence would
  * flag an entire small-but-legitimate slice).
  *
  * Exact integers end to end: values profile in fx space
  * (`floor(v·100)`, the [[Profiler]] convention), quartiles are
  * DISCRETE (type-1: the value at rank ⌈p·n⌉ — no interpolation, so
  * no float ever exists to diverge), and the 1.5·IQR fences compare
  * in doubled units (`2·fx < 2·Q1 − 3·IQR`) so the halves stay
  * integer. Rank ties are harmless by construction: duplicates of a
  * value share the value, so the rank-k VALUE is deterministic even
  * though row_number breaks ties arbitrarily.
  *
  * Scale shape: one per-group window sort (partitioned by the group
  * key — sorts spill per partition, nothing global) reduced to ≤2
  * quartile rows per group, then the flagging pass streams the
  * corpus once against the group-bounded fence table (broadcast).
  * Two corpus scans total, both column-pruned to (group, value) —
  * the stats-then-sweep trade every fence/binning operator here
  * documents.
  *
  * Output: (groupCol, n, q25_fx, q75_fx, n_low, n_high) per group.
  */
object Outliers {

  def robustOutliers(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
      floor(col(valCol) * 100).cast("long").as("__fx"))
    val byG = Window.partitionBy(col("__g"))
    val k25 = expr("(__n + 3) div 4")     // ⌈n/4⌉
    val k75 = expr("(3 * __n + 3) div 4") // ⌈3n/4⌉
    val fences = base
      .withColumn("__rn", row_number().over(byG.orderBy(col("__fx"))))
      .withColumn("__n", count(lit(1)).over(byG))
      .filter(col("__rn") === k25 || col("__rn") === k75)
      .groupBy(col("__g"))
      .agg(
        min(when(col("__rn") === k25, col("__fx"))).as("q25_fx"),
        max(when(col("__rn") === k75, col("__fx"))).as("q75_fx"))
    val iqr = col("q75_fx") - col("q25_fx")
    base.join(broadcast(fences), Seq("__g"))
      .groupBy(col("__g"))
      .agg(
        count(lit(1)).as("n"),
        max(col("q25_fx")).as("q25"),
        max(col("q75_fx")).as("q75"),
        sum(when(lit(2) * col("__fx") < lit(2) * col("q25_fx") - lit(3) * iqr,
          1L).otherwise(0L)).as("n_low"),
        sum(when(lit(2) * col("__fx") > lit(2) * col("q75_fx") + lit(3) * iqr,
          1L).otherwise(0L)).as("n_high"))
      .select(col("__g").as(groupCol), col("n"),
        col("q25").as("q25_fx"), col("q75").as("q75_fx"),
        col("n_low"), col("n_high"))
      .orderBy(col(groupCol))
  }
}
