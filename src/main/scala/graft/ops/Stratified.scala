package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified sampling with EXACT integer allocation — the
  * rebalancing primitive a corpus-assembly pipeline runs when a
  * fixed token/document budget must be split across strata (lang,
  * source, domain) in proportion to their sizes: largest-remainder
  * (Hamilton) apportionment, then a deterministic per-stratum draw.
  *
  * Every step is exact integer arithmetic (base = ⌊k·c_h/N⌋,
  * remainder = (k·c_h) mod N, the +1 ranks by remainder desc with
  * the stratum key as total tiebreak), so the allocation — and with
  * the seeded md5 draw, the SAMPLE ITSELF — hash-replays in SQL.
  * Σ alloc_h = k exactly; no float shares, no rounding drift.
  *
  * Scale shape: the allocation windows run over STRATA rows only
  * (the documented vocabulary-bounded single-partition pattern —
  * strata are languages/sources, thousands at most). The draw ranks
  * rows per stratum by the seeded md5 of their id; the constant
  * rank ≤ k pre-filter right above the window lets Catalyst rewrite
  * it to `WindowGroupLimit` — per-partition top-k heaps before the
  * stratum exchange, so a skewed stratum never sorts all its rows
  * in one task. The dynamic alloc_h cut then joins broadcast
  * (strata-sized) onto the ≤ k·|strata| survivors.
  */
object Stratified {

  /** Largest-remainder allocation of `k` over the stratum counts.
    * Input: one row per stratum with a long count. Output columns:
    * stratum, c, alloc (Σ alloc = min(k, N) when every c_h ≥ alloc_h
    * — callers keep k ≪ N).
    */
  def allocate(counts: DataFrame, stratumCol: String, cntCol: String,
      k: Int): DataFrame = {
    val tot = Window.partitionBy()
    val byRem = Window.orderBy(col("__rem").desc, col(stratumCol))
    counts
      .withColumn("__n", sum(col(cntCol)).over(tot))
      .withColumn("__base",
        expr(s"CAST($k AS BIGINT) * $cntCol DIV __n"))
      .withColumn("__rem",
        expr(s"(CAST($k AS BIGINT) * $cntCol) % __n"))
      .withColumn("__rk", row_number().over(byRem))
      .withColumn("__short", lit(k.toLong) - sum(col("__base")).over(tot))
      .select(col(stratumCol), col(cntCol).as("c"),
        (col("__base") +
          when(col("__rk") <= col("__short"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Proportional stratified sample of `k` rows: exact allocation
    * per stratum, then the seeded md5 draw. Returns (stratum, rn,
    * id) — rn is the within-stratum draw rank, so the result is a
    * total-ordered, hash-verifiable "random" sample.
    */
  def sample(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, seed: Int): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__c"))
    val alloc = allocate(counts, stratumCol, "__c", k)
      .select(col(stratumCol), col("alloc"))
    val byDraw = Window.partitionBy(col(stratumCol))
      .orderBy(md5(concat(lit(s"$seed:"),
        col(idCol).cast("string"))), col(idCol))
    df.select(col(stratumCol), col(idCol))
      .withColumn("__rn", row_number().over(byDraw))
      .filter(col("__rn") <= lit(k)) // constant bound → WindowGroupLimit
      .join(broadcast(alloc), stratumCol)
      .filter(col("__rn") <= col("alloc"))
      .select(col(stratumCol), col("__rn").cast("long").as("rn"),
        col(idCol))
  }
}
