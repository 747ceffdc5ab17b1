package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables.table
import graft.ops.Relational

/** Window / ordering / ranking surface (SURVEY.md §2.5) plus the
  * reference idioms rebuilt on first-class operators: deterministic
  * row ids (W1), top-k per group (W4/W5), corrected-row replacement
  * (J9), composite ids, sessionization (lag analytics).
  */
object WindowQueries extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking + running aggregates per group. The running sum is
    // order-defined (sequential adds) so it is exactly reproducible.
    "q26_running_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      table(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
            .as("running_total"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .as("price_rank"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Top-k per group via Relational.topKPerGroup — the scalable
    // replacement for the reference's filter+limit+union class
    // balancing (W4; NewsMarchSubCategoryTrainProcess.scala:67-70).
    "q27_topk_per_group" -> ((s, dir) => {
      Relational.topKPerGroup(
        table(s, dir, "orders"),
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderpriority"), col("price").desc, col("o_orderkey"))
    }),

    // Deterministic contiguous 1-based ids (W1 dfZipWithIndex,
    // ArticleInfoProcess.scala:17-36) — RDD zipWithIndex under a
    // total order, no single-partition window bottleneck.
    "q28_zip_with_index" -> ((s, dir) => {
      Relational.zipWithIndex(
        table(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "row_id", Seq(col("c_custkey")))
        .orderBy(col("row_id"))
    }),

    // Corrected-row replacement (J9; BrowserCategory.scala:28-42):
    // corrections built deterministically from the data itself.
    "q29_union_corrected" -> ((s, dir) => {
      val base = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val corrections = base.filter(col("c_custkey") <= 50)
        .withColumn("c_mktsegment", lit("REVIEWED"))
      Relational.unionCorrected(base, corrections, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // Composite id (F1/ArticleInfoProcess.scala:79) — md5 over
    // concatenated key fields; oracle recomputes independently.
    "q30_composite_id" -> ((s, dir) => {
      Relational.compositeId(
        table(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        Seq("s_suppkey", "s_name"), "sid")
        .orderBy(col("s_suppkey"))
    }),

    // Sessionization by inactivity gap (lag + cumulative flag) —
    // the batch-SQL twin of the streaming state operator in
    // graft.streaming; 30-minute gap starts a new session.
    // Timestamps truncated to seconds so micro/nano precision
    // differences between engines can't flip a boundary.
    "q31_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      table(s, dir, "events")
        .withColumn("ts_sec", date_trunc("second", col("ts")))
        .withColumn("gap_s",
          col("ts_sec").cast("long") -
            lag(col("ts_sec"), 1).over(byUser).cast("long"))
        .withColumn("new_session",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q26_running_window" ->
      """SELECT o_custkey, o_orderkey,
        | cast(row_number() OVER w AS int) AS rn,
        | round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        | lag(o_orderkey, 1) OVER w AS prev_order,
        | lead(o_orderkey, 1) OVER w AS next_order,
        | cast(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS int) AS price_rank
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q27_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, price DESC, o_orderkey""".stripMargin,
    "q28_zip_with_index" ->
      """SELECT cast(row_number() OVER (ORDER BY c_custkey) as bigint) AS row_id,
        | c_custkey, c_name
        |FROM customer ORDER BY row_id""".stripMargin,
    "q29_union_corrected" ->
      """SELECT c_custkey,
        | CASE WHEN c_custkey <= 50 THEN 'REVIEWED' ELSE c_mktsegment END AS c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q30_composite_id" ->
      """SELECT s_suppkey, s_name,
        | md5(cast(s_suppkey as varchar) || '|' || s_name) AS sid
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q31_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS ts_sec
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts_sec,
        |    CASE WHEN lag(ts_sec) OVER w IS NULL
        |         OR epoch(ts_sec) - epoch(lag(ts_sec) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        |SELECT user_id,
        | cast(sum(new_session) as bigint) AS n_sessions,
        | cast(count(*) as bigint) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
