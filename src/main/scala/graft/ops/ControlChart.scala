package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EWMA-style control-chart gate — the per-entity anomaly member of
  * the drift family (χ² q171 / PSI q195 / KS q187 / JS q198 screen
  * DISTRIBUTIONS; this screens individual observations against each
  * entity's own recent history, the classic metric-monitoring gate).
  *
  * Exactness contract (the fx discipline of [[Profiler]]): values
  * quantize to `floor(v·100)` longs, and the moving average is the
  * λ=½ EWMA truncated at depth 8 — whose weights 2⁷…2⁰ are exact
  * integers, so the weighted history `hist = Σ lag(xq,i)·2^(8-i)`
  * and the gate comparisons `255·xq ≷ k·hist` are all-integer and
  * replay bit-identically in any engine. No floating-point state, no
  * round-tie exposure.
  *
  * Scale shape: one window pass partitioned by the ENTITY key (users
  * — high cardinality, so the window parallelizes across the
  * cluster; never partition a window by a 5-value column), 8 `lag`s
  * sharing one frame, then a map-side-combinable aggregate to the
  * |event_type|-bounded summary. Corpus rows shuffle once, by
  * entity.
  */
object ControlChart {

  /** Dyadic weights newest→oldest: lag 1 gets 2⁷ … lag 8 gets 2⁰. */
  val Depth = 8
  private val WTotal = (1 << Depth) - 1 // 255

  /** The gate's two derived columns over an already-quantized `xq`
    * under window `w`: `(dev, status)` — shared by the batch
    * operator and the maintenance twin's boundary pass (which runs
    * the same integer math over a tagged tail++head segment).
    */
  def gateColumns(xq: Column,
      w: org.apache.spark.sql.expressions.WindowSpec,
      k: Int): (Column, Column) = {
    val hist: Column = (1 to Depth)
      .map(i => lag(xq, i).over(w) * lit(1L << (Depth - i)))
      .reduce(_ + _)
    val dev = xq * lit(WTotal.toLong) - hist
    val status = when(hist.isNull || xq.isNull,
        lit(null).cast("string"))
      .when(xq * lit(WTotal.toLong) > lit(k.toLong) * hist, "spike")
      .when(lit(k.toLong) * xq * lit(WTotal.toLong) < hist, "dip")
      .otherwise("ok")
    (dev, status)
  }

  /** Per-row gate over `events`: each row with a full 8 prior
    * observations in its `userCol` stream (ordered by `tsCol`,
    * `idCol`) is compared against its dyadic-weighted history;
    * `status` is `spike` when `xq·255 > k·hist`, `dip` when
    * `k·xq·255 < hist`, else `ok`; rows without full history pass
    * through with NULL status (ungated, by contract). Output keeps
    * (userCol, idCol, typeCol, xq, dev, status) where
    * `dev = 255·xq − hist` is the exact scaled deviation.
    */
  def ewmaGate(events: DataFrame, userCol: String, valCol: String,
      tsCol: String, idCol: String, typeCol: String,
      k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val xq = floor(col(valCol) * 100).cast("long")
    val (dev, status) = gateColumns(xq, w, k)
    events.select(col(userCol), col(idCol), col(typeCol),
      xq.as("xq"), dev.as("dev"), status.as("status"))
  }

  /** The |event_type|-bounded dashboard summary of [[ewmaGate]]:
    * per type, how many observations were gated, how many tripped
    * each side, and the exact summed |dev| of the tripped ones (the
    * "how bad" column). This is the relation the maintenance twin
    * keeps live.
    */
  def ewmaSummary(events: DataFrame, userCol: String, valCol: String,
      tsCol: String, idCol: String, typeCol: String,
      k: Int = 3): DataFrame =
    summarize(ewmaGate(events, userCol, valCol, tsCol, idCol,
      typeCol, k), typeCol)

  /** Aggregate a per-row gate relation to the summary shape —
    * shared by the batch operator and the maintenance twin's
    * in-batch/boundary passes.
    */
  def summarize(gated: DataFrame, typeCol: String): DataFrame =
    gated.filter(col("status").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gated"),
        sum(when(col("status") === "spike", 1L).otherwise(0L))
          .as("n_spike"),
        sum(when(col("status") === "dip", 1L).otherwise(0L))
          .as("n_dip"),
        sum(when(col("status") =!= "ok", abs(col("dev")))
          .otherwise(0L)).as("sum_absdev"))
      .orderBy(col(typeCol))
}
