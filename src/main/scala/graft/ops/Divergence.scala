package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Jensen–Shannon divergence between the token distributions of two
  * corpus slices — the mixture-design gate: before blending sources
  * (or swapping one crawl snapshot for another) a pipeline wants
  * "how different are these corpora, and WHICH tokens carry the
  * difference". JSD is the symmetric, bounded (≤ ln 2) form of KL:
  *
  *   JSD(P,Q) = ½·Σ_w [ p·ln(p/m) + q·ln(q/m) ],  m = (p+q)/2
  *
  * A zero count contributes exactly 0 to its own side (lim x·ln x),
  * and m > 0 wherever either side has the token, so no smoothing is
  * needed and the sum is total. Each token's contribution is floored
  * to e6 BEFORE summing (the per-row-floor-then-integer-sum
  * discipline every ln-bearing operator here follows), so both the
  * per-token terms and any Σ over them replay exactly in another
  * engine — the divergence readout is Σ jsd_term_e6 / 1e6.
  *
  * Scale shape: ONE tagged-union token aggregate (corpus rows
  * combine map-side; the exchange carries distinct terms), then the
  * totals come from an unpartitioned window over the VOCABULARY
  * rows — the documented vocabulary-bounded single-partition trade
  * (W2 pattern) that keeps the corpus scanned exactly once, vs a
  * totals re-aggregate that would re-inline the scan subtree.
  */
object Divergence {

  /** Per-token JSD contributions of slice `a` vs slice `b` (token
    * arrays in `tokensCol`): (term, n_a, n_b, jsd_term_e6). Callers
    * rank/limit; Σ jsd_term_e6 is the corpus divergence in e6.
    */
  def jsTerms(a: DataFrame, b: DataFrame, tokensCol: String): DataFrame = {
    val tagged = a
      .select(explode(col(tokensCol)).as("term"), lit(0).as("__side"))
      .unionByName(b
        .select(explode(col(tokensCol)).as("term"), lit(1).as("__side")))
      .filter(length(col("term")) > 0)
    val counts = tagged.groupBy(col("term")).agg(
      sum(when(col("__side") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__side") === 1, 1L).otherwise(0L)).as("n_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val pa = col("n_a").cast("double") / col("__ta")
    val pb = col("n_b").cast("double") / col("__tb")
    val m = (pa + pb) / lit(2.0)
    counts
      .withColumn("__ta", sum(col("n_a")).over(w))
      .withColumn("__tb", sum(col("n_b")).over(w))
      .withColumn("jsd_term_e6", floor(
        (when(col("n_a") > 0, pa * log(pa / m)).otherwise(lit(0.0)) +
          when(col("n_b") > 0, pb * log(pb / m)).otherwise(lit(0.0)))
          * lit(500000.0)).cast("long"))
      .select(col("term"), col("n_a"), col("n_b"), col("jsd_term_e6"))
  }
}
