package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table
import graft.ops.TimeJoins

/** Temporal-join surface: as-of join and bucketed interval join
  * (operators Spark has no built-in form for; see
  * [[graft.ops.TimeJoins]] for the single-shuffle shapes). The
  * as-of oracle uses DuckDB's native ASOF JOIN — an independent
  * implementation of the semantics, not a replay of ours.
  */
object TimeJoinQueries extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Calendar-spine gap fill: every (user, day) cell over the
    // observed range, zero-filled where no events landed — the
    // dense-grid shape time-series feature pipelines need. The spine
    // is users × sequence(min_day, max_day): both sides derive from
    // the data, no hand-written calendar.
    "q86_date_spine" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val days = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("day"))
      val users = ev.select(col("user_id")).distinct()
      val agg = ev.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      users.crossJoin(broadcast(days))
        .join(agg, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0)).as("total"))
        .orderBy(col("user_id"), col("day"))
    }),

    // As-of: each click event picks up the same user's latest
    // purchase at or before it (nulls where no purchase precedes).
    "q77_asof_join" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("p_event"), col("value").as("p_value"))
      TimeJoins.asofJoin(clicks, purchases, "user_id", "ts")
        .select(col("event_id"), col("user_id"), col("p_event"),
          col("p_value"))
        .orderBy(col("event_id"))
    }),

    // Same as-of semantics through the hot-key-safe bucketed variant
    // (window partitioned by (key, hour-bucket) + carry-in): the same
    // independent DuckDB ASOF oracle must reproduce it exactly.
    "q87_asof_bucketed" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("p_event"), col("value").as("p_value"))
      TimeJoins.asofJoinBucketed(clicks, purchases, "user_id", "ts",
        bucketWidthSec = 3600)
        .select(col("event_id"), col("user_id"), col("p_event"),
          col("p_value"))
        .orderBy(col("event_id"))
    }),

    // Interval join without an equi-key: lineitem prices against 20
    // overlapping price bands, bucketed so the join stays an
    // equi-join (no broadcast-nested-loop).
    "q78_range_join" -> ((s, dir) => {
      val bands = s.range(20).toDF("band_id")
        .select(col("band_id"),
          (col("band_id") * 5000.0).as("lo"),
          (col("band_id") * 5000.0 + 7500.0).as("hi"))
      val joined = TimeJoins.rangeJoinBucketed(
        table(s, dir, "lineitem")
          .select(col("l_extendedprice"), col("l_quantity")),
        "l_extendedprice", bands, "lo", "hi", bucketWidth = 5000.0)
      joined.groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy(col("band_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q86_date_spine" ->
      """WITH ev AS (
        |  SELECT user_id, cast(ts AS DATE) AS day, value FROM events),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        |days AS (
        |  SELECT cast(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |users AS (SELECT DISTINCT user_id FROM ev),
        |agg AS (
        |  SELECT user_id, day, cast(count(*) as bigint) AS n,
        |    cast(sum(cast(value AS decimal(18,4))) as double) AS total
        |  FROM ev GROUP BY user_id, day)
        |SELECT u.user_id, d.day,
        |  coalesce(a.n, 0) AS n, coalesce(a.total, 0.0) AS total
        |FROM users u CROSS JOIN days d
        |LEFT JOIN agg a ON a.user_id = u.user_id AND a.day = d.day
        |ORDER BY u.user_id, d.day""".stripMargin,
    "q77_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, event_id AS p_event, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, p.p_event, p.p_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q87_asof_bucketed" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, event_id AS p_event, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, p.p_event, p.p_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q78_range_join" ->
      """WITH bands AS (
        |  SELECT cast(r.range AS bigint) AS band_id,
        |         r.range * 5000.0 AS lo,
        |         r.range * 5000.0 + 7500.0 AS hi
        |  FROM range(20) r)
        |SELECT band_id, cast(count(*) as bigint) AS n,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2))) as double)
        |    AS sum_price
        |FROM lineitem JOIN bands
        |  ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin
  )
}
