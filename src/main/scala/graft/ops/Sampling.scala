package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
  * Spirakis 2006) — the per-ITEM companion to the class-level
  * temperature mix (`pipeline.Pipelines.temperatureSample`): draw k
  * rows where inclusion follows each row's own weight (sample
  * documents proportional to quality, passages proportional to
  * length, ...), by ranking on key u^(1/w) with u uniform and
  * keeping the top k.
  *
  * Engine-portable determinism: u comes from the cross-engine
  * md5-prefix hash (u = (h+1)/2^48 ∈ (0,1], seeded), and the rank
  * uses the monotone-equivalent ln(u)/w floored to integer
  * billionths on an IDENTICAL left-to-right IEEE expression in both
  * engines (the bm25-oracle precedent), id as total tiebreak — so
  * the SAMPLE ITSELF is an exactly replayable function of
  * (data, seed), and q193 hash-verifies a "random" sample.
  *
  * Scale shape: the key is one md5 + one ln in the scan Project (no
  * shuffle), and the top-k cut is `TakeOrderedAndProject` —
  * per-partition heaps, k rows to the merge, never a global sort.
  * Weights must be positive; non-positive rows are excluded (ES is
  * undefined there), identically on both sides.
  */
object Sampling {

  /** The ES rank key in integer billionths: floor(1e9 · ln(u) / w).
    * Larger = more likely selected; ties break on the caller's id.
    */
  def esKeyE9(id: Column, weight: Column, seed: Int): Column = {
    val h = conv(substring(
      md5(concat(lit(s"$seed:"), id.cast("string"))), 1, 12), 16, 10)
      .cast("long")
    floor(lit(1000000000.0) *
      log((h.cast("double") + lit(1.0)) / lit(281474976710656.0)) /
      weight).cast("long")
  }

  /** Top-k weighted sample without replacement: (original columns +
    * key_e9), ordered (key desc, id asc).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int, seed: Int): DataFrame =
    df.filter(weight > 0)
      .withColumn("key_e9", esKeyE9(col(idCol), weight, seed))
      .orderBy(col("key_e9").desc, col(idCol))
      .limit(k)
}
