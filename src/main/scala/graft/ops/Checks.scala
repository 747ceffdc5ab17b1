package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated in ONE pass — the
  * Deequ-style contract a pipeline runs against every new drop of
  * data before letting it downstream: completeness (no nulls),
  * domain membership, value bounds, uniqueness. A naive checker runs
  * one job per rule; here every rule's measurement is one aggregate
  * expression in a single `agg(...)` over a single scan (the q169
  * profiler discipline), unpivoted to a (rule, measured, lo, hi,
  * pass) verdict table. Measurements are exact longs — counts or
  * fx-space extrema — so the verdict table hash-compares against a
  * SQL replay (q177), and "pass" is integer comparison, never a
  * float tolerance.
  */
object Checks {

  /** One constraint: a name, a long-valued measurement aggregate,
    * and the inclusive [lo, hi] band the measurement must land in.
    */
  final case class Rule(name: String, metric: Column, lo: Long, hi: Long)

  /** Completeness: null count of `c` (pass band [0, 0] for NOT NULL
    * columns; widen for columns with a null budget).
    */
  def nullCount(c: String): Column =
    sum(when(col(c).isNull, 1L).otherwise(0L))

  /** Domain membership: rows whose `c` is OUTSIDE the allowed set. */
  def outOfDomain(c: String, allowed: Seq[String]): Column =
    sum(when(col(c).isin(allowed: _*), 0L).otherwise(1L))

  /** fx-space extrema for bounds rules. */
  def minFx(c: String): Column = min(floor(col(c) * 100).cast("long"))
  def maxFx(c: String): Column = max(floor(col(c) * 100).cast("long"))

  /** Duplicate count of a key that should be unique: non-null-keyed
    * rows − distinct(key). Null keys are a COMPLETENESS violation
    * ([[nullCount]]), not a uniqueness one — counting them here
    * would conflate the two rules.
    */
  def duplicateCount(cols: Seq[String]): Column = {
    val allNotNull = cols.map(col(_).isNotNull).reduce(_ && _)
    sum(when(allNotNull, 1L).otherwise(0L)) -
      countDistinct(cols.head, cols.tail: _*)
  }

  /** Evaluate all rules in one aggregate over one scan. Output one
    * row per rule: (rule, measured, lo, hi, pass), ordered by rule.
    */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      r.metric.cast("long").as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.name}', __m$i, ${r.lo}L, ${r.hi}L," +
        s" __m$i >= ${r.lo}L AND __m$i <= ${r.hi}L"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS" +
        " (rule, measured, lo, hi, pass)")
      .orderBy(col("rule"))
  }
}
