package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table
import graft.streaming.Streams

/** Event-time windowing surface (SURVEY.md §2.11 extension). The
  * exact `window()` expressions used by the streaming module run
  * here in batch mode over the events table, which makes them
  * oracle-verifiable (DuckDB `time_bucket`); the streaming specs
  * cover the incremental/watermark semantics.
  */
object EventQueries extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type.
    "q68_tumbling_window" -> ((s, dir) => {
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // Sliding 1-hour windows every 30 minutes (each event lands in 2).
    "q69_sliding_window" -> ((s, dir) => {
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("n"))
        .orderBy(col("win_start"))
    }),

    // Gap-based batch sessionization (the streaming module's batch
    // twin over real event data): sessions per user with 30-minute
    // silence cutting, corpus-level session-length histogram.
    "q70_session_stats" -> ((s, dir) => {
      Streams.sessionizeBatch(table(s, dir, "events"),
        "user_id", "ts", "value", gapMs = 30 * 60 * 1000L)
        .groupBy(col("n"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q68_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |       cast(count(*) as bigint) AS n, round(sum(value), 4) AS total
        |FROM events GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    "q69_sliding_window" ->
      // a 1h/30m sliding window: event t belongs to the windows
      // starting at bucket30(t) and bucket30(t) - 30min
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - to_minutes(off)
        |         AS win_start,
        |       cast(count(*) as bigint) AS n
        |FROM events, (SELECT unnest([0, 30]) AS off) o
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
    "q70_session_stats" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER
        |           (PARTITION BY user_id ORDER BY ts)) > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged),
        |per AS (
        |  SELECT user_id, session_id, cast(count(*) as bigint) AS n
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT n, cast(count(*) as bigint) AS n_sessions
        |FROM per GROUP BY n ORDER BY n""".stripMargin
  )
}
