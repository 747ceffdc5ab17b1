package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    FunctionQueries,
    WindowQueries,
    TextQueries,
    DedupQueries,
    NlpQueries,
    MlQueries,
    GraphQueries,
    EventQueries,
    MediaQueries,
    StructQueries,
    TimeJoinQueries,
    VectorQueries,
    AnalyticQueries,
    PipelineQueries,
    CurationQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join + aggregate spine (SURVEY §3 E2's shape on the
    * test schema).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
