package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog — the distinct-count sketch with a
  * hash-verifiable register table. Spark's built-in
  * `approx_count_distinct` IS HLL++ but its registers are opaque
  * (xxhash-based, bias-corrected internals) — fine for the q20x
  * profiler fast paths, unverifiable by an oracle. This one derives
  * everything from md5, the engine-portable hash every dedup
  * operator here already rides:
  *
  *   h      = first 12 md5 hex chars as a 48-bit integer
  *   bucket = top `b` bits (m = 2^b registers)
  *   w      = remaining k = 48−b bits
  *   rho(w) = leading zeros of w in k bits + 1
  *          = k + 1 − length(bin(w))      (w > 0; k + 1 when w = 0)
  *   register[bucket] = max rho — the classic Flajolet et al. 2007
  *   sketch, exactly reproducible by any engine with md5 + bin.
  *
  * The raw estimate stays EXACT-INTEGER: with rho ≤ k+1,
  * Σ 2^−rho over m registers (empty register → rho 0 → term 1)
  * scales by 2^(k+1) into a long-sized sum, and
  *   est = α_m·m²/Σ2^−rho = (α_m·1000)·m²·2^(k+1) div (1000·S)
  * with S = Σ 2^(k+1−rho) (scale 2^(k+1), so the rho = k+1 term is
  * still the integer 1) and α_m·1000 an integer constant —
  * decimal-widened so the numerator cannot wrap. NO
  * small/large-range correction: the
  * bias-corrected variants need ln() (not correctly-rounded IEEE,
  * so not twin-verifiable); the register table and zero-register
  * count travel with the estimate so any downstream can apply its
  * own correction. HllSpec pins mergeability (max-merge of register
  * tables == registers of the union — what makes the sketch a
  * monoid and the streaming maintainer a fold) and the estimate's
  * error band on known cardinalities.
  *
  * Scale shape: ONE map-side-combinable (group, bucket) max
  * aggregate over the corpus — the exchange carries ≤ |groups|·m
  * rows of (int, int); the estimate is a ≤m-row fold per group.
  * This is the sketch you ship to 1000 executors when
  * count(DISTINCT) would shuffle every key.
  */
object Hll {

  /** Register-index bits: m = 64 registers (±13% standard error —
    * the VERIFIABILITY point is the contract here, not tightness;
    * raise b for tighter bands, the math is b-generic).
    */
  val B = 6
  val M: Int = 1 << B
  /** Remainder bits. */
  val K: Int = 48 - B
  /** α_64 · 1000 (Flajolet et al. 2007, α_m for m = 64). */
  val Alpha1000 = 709L

  /** 48-bit md5-derived hash of a key column. */
  def hash48(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-group register table: (groupCols..., bucket, r) — only
    * occupied buckets appear (empty ⇒ rho 0, restored by
    * [[estimate]]). One map-side-combined aggregate.
    */
  def registers(df: DataFrame, keyCol: String,
      groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ hash48(col(keyCol)).as("__h"): _*)
      .withColumn("bucket", expr(s"__h div ${1L << K}").cast("int"))
      .withColumn("__w", expr(s"__h % ${1L << K}"))
      // rho = k+1 - length(bin(w)) for w>0; bin(0)='0' would give k,
      // but the w=0 case must read k+1 — both engines agree on bin()
      .withColumn("r",
        when(col("__w") === 0L, lit(K + 1))
          .otherwise(lit(K + 1) - length(expr("bin(__w)"))).cast("int"))
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Max-merge two register tables (the HLL monoid: registers of
    * A ∪ B == merge of registers of A and B — spec-pinned).
    */
  def merge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** Raw HLL estimate per group off a register table:
    * (groupCols..., est, zero_regs). Exact integer — the ≤m-row
    * fold S = Σ 2^(k+1−rho) (empty buckets contribute 2^(k+1); the
    * exact-shift, never pow-double) and one decimal-widened
    * division.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    regs
      .groupBy(g: _*)
      .agg(
        sum(expr(s"shiftleft(cast(1 as bigint), ${K + 1} - r)"))
          .as("__s_occ"),
        count(lit(1)).as("__n_occ"))
      // empty registers: (m - occupied) buckets at rho 0 → 2^(k+1)
      .withColumn("__s",
        col("__s_occ") +
          (lit(M.toLong) - col("__n_occ")) * lit(1L << (K + 1)))
      .withColumn("zero_regs", (lit(M.toLong) - col("__n_occ")).cast("long"))
      .withColumn("est", expr(
        s"cast($Alpha1000 as decimal(38,0)) * ${M.toLong * M} * ${1L << (K + 1)}" +
          s" div (cast(1000 as decimal(38,0)) * __s)"))
      .select(g ++ Seq(col("est"), col("zero_regs")): _*)
  }
}
