package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audit gates (Sweeney 2002 k-anonymity; Machanavajjhala
  * et al. 2007 l-diversity) — the release-readiness checks a
  * training-data pipeline runs before shipping a derived table: how
  * many quasi-identifier groups are small enough to re-identify,
  * and how many expose a sensitive attribute through value
  * uniformity. The PII scrubber ([[graft.expressions.PiiScrub]])
  * removes direct identifiers; this measures the INDIRECT ones.
  *
  * Scale shape: one groupBy on the quasi-identifier tuple with
  * map-side combine (count + approx-free exact distinct via a
  * two-level aggregate), then a bounded summary. Corpus rows
  * shuffle once, keyed by the QI tuple.
  */
object Privacy {

  /** Per-QI-group audit relation: (qi columns, n, n_sensitive) —
    * group size and exact distinct sensitive values, via the
    * two-level aggregate (group × value first, then group) so no
    * per-group value set ever materializes.
    */
  def groupAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame =
    df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__nv"))
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("__nv")).as("n"),
        count(lit(1)).as("n_sensitive"))

  /** The release gate summary: total groups/rows, k-anonymity
    * violations (groups of size < k and the rows they hold) and
    * l-diversity violations (groups with fewer than l distinct
    * sensitive values), plus the corpus-wide minima that state the
    * achieved k and l.
    */
  def anonymityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame =
    groupAudit(df, qiCols, sensitiveCol).agg(
      count(lit(1)).as("n_groups"),
      sum(col("n")).as("n_rows"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("k_violations"),
      sum(when(col("n") < k, col("n")).otherwise(0L))
        .as("rows_at_risk"),
      sum(when(col("n_sensitive") < l, 1L).otherwise(0L))
        .as("l_violations"),
      min(col("n")).as("k_achieved"),
      min(col("n_sensitive")).as("l_achieved"))
}
