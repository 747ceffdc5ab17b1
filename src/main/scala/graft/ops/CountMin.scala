package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch — the frequency-estimation
  * companion to the seen-set Bloom ([[Bloom]]) and the KMV distinct
  * sketch ([[DistinctSketch]]): point-lookup "how often has this key
  * appeared" over a corpus whose exact per-key count table is too
  * big to keep, in d·w bounded counters. Guarantee (the classic
  * Cormode–Muthukrishnan bound): est ≥ true always (counters only
  * ever ABSORB collisions), and the overshoot is whatever mass
  * collided into the key's d buckets — one-sided, so a downstream
  * gate can trust "est < threshold ⇒ truly rare".
  *
  * Every counter is a PURE INTEGER FUNCTION of the data — row r of
  * key x increments bucket `md5_48(r + ":" + str(x)) mod w` (the
  * project's cross-engine md5-prefix idiom, [[Bloom.bitPos]]'s
  * sibling) — so a SQL engine replays the sketch, the estimates,
  * AND the per-key overshoot exactly; q196 hash-compares all three
  * against the exact counts they stand in for.
  *
  * Scale shape: the build is one explode-d aggregate — corpus rows
  * combine map-side, the exchange carries ≤ d·w counter rows; the
  * sketch is a bounded broadcastable table (d·w rows; 4×256 = 1 KB
  * of longs) and estimates attach to probes by broadcast join, so a
  * probe corpus never shuffles. Sketches over disjoint slices MERGE
  * by (row, bucket) counter addition ([[merge]], spec-pinned equal
  * to sketching the union) — the same mergeable-state contract as
  * the incremental aggregates, so a stream maintains one at
  * per-batch cost.
  */
object CountMin {

  /** Hash row r's bucket for key `c` — pure column expression,
    * replayable in any engine (48-bit md5 prefix, positive, mod w).
    */
  def bucket(c: Column, r: Int, w: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), c.cast("string"))), 1, 12),
      16, 10).cast("long") % w

  /** The d×w counter table (__r, __b, __n) from ONE explode-d
    * aggregate over the corpus — never a per-row loop, never more
    * than d·w rows on the wire after the map-side combine.
    */
  def sketch(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame =
    df.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("__r"), bucket(col(keyCol), r, w).as("__b"))): _*))
        .as("__rb"))
      .groupBy(col("__rb.__r").as("__r"), col("__rb.__b").as("__b"))
      .agg(count(lit(1)).as("__n"))

  /** Counter-wise sum of two sketches built with the same (d, w) —
    * the mergeable-state monoid: merge(sketch(A), sketch(B)) equals
    * sketch(A ∪ B) exactly (counts add; the hash ignores which slice
    * a row came from).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("__r"), col("__b"))
      .agg(sum(col("__n")).as("__n"))

  /** Point estimates for the `keyCol` keys of `probes`: min over the
    * key's d counters (0 when a bucket was never touched), appended
    * as `est_n` with every probe column CARRIED THROUGH (grouped on
    * the full probe row) — so a probe table that already carries
    * exact counts or payloads is referenced ONCE, never re-joined
    * afterwards (a post-hoc join would re-inline the probe subtree —
    * the q116 trap, bitten by q196's first formulation). The sketch
    * side is d·w-bounded and broadcast — probe rows never shuffle
    * for the lookup; the only exchange is the per-probe-row min
    * aggregate, bounded by the probe set.
    */
  def estimate(sk: DataFrame, probes: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    val carry = probes.columns.toSeq.map(col)
    // __pid keys the min-aggregate per probe ROW, not per distinct
    // row value — duplicate probe rows each keep their estimate
    val withId = probes.withColumn("__pid",
      monotonically_increasing_id())
    val grp = col("__pid") +: carry
    withId
      .select(grp :+
        explode(array((0 until d).map(r =>
          struct(lit(r).as("__r"), bucket(col(keyCol), r, w).as("__b"))): _*))
          .as("__rb"): _*)
      .select(grp :+ col("__rb.__r").as("__r") :+
        col("__rb.__b").as("__b"): _*)
      .join(broadcast(sk), Seq("__r", "__b"), "left")
      .na.fill(0L, Seq("__n"))
      .groupBy(grp: _*)
      .agg(min(col("__n")).as("est_n"))
      .drop("__pid")
  }
}
