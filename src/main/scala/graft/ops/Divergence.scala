package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Token–label mutual information — the SUPERVISED companion to
    * [[jsTerms]]: which tokens carry information about a {0,1}
    * document label (which tokens identify the English slice, the
    * contaminated source, the high-quality class). Presence-based:
    * each document votes once per distinct token, so a single
    * token-spamming document cannot dominate the ranking. Per token
    * the 2×2 table (present/absent × pos/neg, derived from the
    * per-term positive count plus 1-row broadcast totals) yields
    *
    *   MI(t) = Σ_cells (c/N)·ln(c·N / (row·col)),  0 where c = 0
    *
    * with each of the four cell terms floored to e6 independently
    * and integer-summed (individual cells go negative; the sum is
    * the ≥0-up-to-flooring MI) — so the ranking replays exactly.
    *
    * Scale shape: one distinct-explode term aggregate (corpus rows
    * combine map-side, the exchange carries distinct terms) plus a
    * 1-row label-total aggregate broadcast onto it; the doc table is
    * read twice, the totals pass column-pruned to the label alone.
    */
  def tokenLabelMi(docs: DataFrame, tokensCol: String,
      posCol: String): DataFrame = {
    val tot = docs.agg(count(lit(1)).as("__nn"),
      sum(col(posCol).cast("long")).as("__n1t"))
    val terms = docs
      .select(col(posCol).cast("long").as("__pos"),
        explode(array_distinct(filter(col(tokensCol),
          t => length(t) > 0))).as("term"))
      .groupBy(col("term"))
      .agg(sum(col("__pos")).as("n_pos"),
        (count(lit(1)) - sum(col("__pos"))).as("n_neg"))
    def cellE6(c: Column, r: Column, q: Column, n: Column): Column =
      floor(when(c > 0,
        (c.cast("double") / n) *
          log((c.cast("double") * n) / (r.cast("double") * q)))
        .otherwise(lit(0.0)) * lit(1000000.0)).cast("long")
    val n = col("__nn")
    val n1t = col("__n1t")
    val n0t = n - n1t
    val rp = col("n_pos") + col("n_neg") // docs containing the term
    val ra = n - rp                      // docs without it
    terms.crossJoin(broadcast(tot))
      .withColumn("mi_e6",
        cellE6(col("n_pos"), rp, n1t, n) +
          cellE6(col("n_neg"), rp, n0t, n) +
          cellE6(n1t - col("n_pos"), ra, n1t, n) +
          cellE6(n0t - col("n_neg"), ra, n0t, n))
      .select(col("term"), col("n_pos"), col("n_neg"), col("mi_e6"))
  }

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
