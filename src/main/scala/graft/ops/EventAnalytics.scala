package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics operators over (user, type, timestamp) streams —
  * the two classics every behavioral warehouse query surface needs:
  * ordered funnels and cohort retention. Both are exact-integer
  * results (user counts, week indices), fully SQL-replayable.
  *
  * Scale shape: everything is keyed on the user. The funnel's step
  * chain is k aggregates + k−1 joins ALL clustered on the user key,
  * so after the first `groupBy(user)` exchange the later steps
  * reuse the partitioning (ClusteredDistribution already satisfied
  * — no second shuffle of the same rows); retention is two
  * user-keyed aggregates and one bounded (cohort, offset) rollup.
  * Neither ever sorts or windows the event stream globally.
  */
object EventAnalytics {

  /** Ordered-sequence funnel: for steps (s1, …, sk), a user counts
    * at step i iff they performed s1 < s2 < … < si at STRICTLY
    * increasing timestamps (the standard "did the click come after
    * the view" semantics, not mere set membership). Output: one row
    * per step — (step, step_name, n_users).
    */
  def orderedFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    val base = events.select(col(userCol).as("__u"),
      col(typeCol).as("__ty"), col(tsCol).as("__ts"))
    val firstStep = base.filter(col("__ty") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    val chain = steps.tail.scanLeft(firstStep) { (prev, st) =>
      base.filter(col("__ty") === st)
        .join(prev, "__u")
        .filter(col("__ts") > col("__t"))
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    }
    chain.zip(steps).zipWithIndex
      .map { case ((tbl, name), i) =>
        tbl.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
            col("n_users"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("step"))
  }

  /** Conversion-window funnel — [[orderedFunnel]] with the product
    * question real funnels ask: step i must occur STRICTLY AFTER
    * step i−1 and within `maxGapMs` of it (gap == maxGapMs still
    * converts — the boundary is inclusive, spec-pinned).
    *
    * Greedy earliest-chaining — correct for the unwindowed funnel —
    * is WRONG under a gap bound: a user with s1 at t=0 and t=50 and
    * s2 at t=100 converts via the t=50 start at gap 60, but the
    * greedy chain anchored at t=0 finds nothing. So each step keeps
    * the full SET of viable timestamps per user: t is viable at step
    * i iff some viable t' at step i−1 has t' < t ≤ t' + maxGapMs.
    * Each step is one user-keyed join + distinct, clustered on the
    * user key like the unwindowed chain; per-user work is bounded by
    * that user's own event counts, and nothing ever sorts globally.
    */
  def windowedFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], maxGapMs: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    require(maxGapMs > 0, "maxGapMs must be positive")
    val base = events.select(col(userCol).as("__u"),
      col(typeCol).as("__ty"), expr(s"unix_millis($tsCol)").as("__tm"))
    val first = base.filter(col("__ty") === steps.head)
      .select(col("__u"), col("__tm")).distinct()
    val chain = steps.tail.scanLeft(first) { (prev, st) =>
      base.filter(col("__ty") === st)
        .join(prev.select(col("__u"), col("__tm").as("__pt")), "__u")
        .filter(col("__tm") > col("__pt") &&
          col("__tm") <= col("__pt") + lit(maxGapMs))
        .select(col("__u"), col("__tm")).distinct()
    }
    chain.zip(steps).zipWithIndex
      .map { case ((tbl, name), i) =>
        tbl.agg(countDistinct(col("__u")).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
            col("n_users"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("step"))
  }

  /** Per-user event-transition counts — the Markov/path-analysis
    * view of a behavior stream: for each user's events in (ts, id)
    * order, count the (from_type → to_type) adjacent transitions
    * corpus-wide. One `lag` window PARTITIONED BY USER (state is a
    * user's own events, never a global sort) and one bounded
    * aggregate (≤ |types|² rows out). The id tiebreaker makes the
    * per-user order total, so the transition counts are
    * deterministic under any partitioning.
    */
  def transitionCounts(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .select(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Per-user ordered path mining: count every length-`len` window
    * of consecutive event types in each user's (ts, id)-ordered
    * stream — the generalization of [[transitionCounts]] from
    * bigrams to arbitrary n-gram paths ("view>click>purchase").
    * One lag-window pass PARTITIONED BY USER produces all `len-1`
    * offsets in a single WindowExec (shared frame, no extra
    * shuffle), then a bounded aggregate: ≤ |types|^len rows out,
    * so the shuffle after the window carries path strings, not
    * events. The id tiebreaker totalizes per-user order, making
    * counts deterministic under any partitioning.
    */
  def pathCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, len: Int): DataFrame = {
    require(len >= 2, "a path needs at least 2 steps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val steps = (len - 1 to 0 by -1).map { off =>
      if (off == 0) col(typeCol) else lag(col(typeCol), off).over(w)
    }
    events
      // ALL steps must be non-null, not just the oldest lag: a NULL
      // event type mid-window would otherwise be silently skipped by
      // concat_ws while a SQL engine's `||` propagates the NULL —
      // requiring every step drops the window in both engines
      // identically
      .select(concat_ws(">", steps: _*).as("path"),
        steps.map(_.isNotNull).reduce(_ && _).as("__full"))
      .filter(col("__full"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
  }

  /** Weekly cohort retention: cohort = the absolute epoch-week of a
    * user's FIRST event; a user is retained at offset k if they were
    * active in cohort_week + k. Output: (cohort_wk, wk_offset,
    * n_users), the classic retention triangle. Week indexing is
    * exact integer epoch arithmetic (`unix_millis div 86400000 div
    * 7`) so any engine reproduces the buckets. (`wk_offset`, not
    * `offset` — OFFSET is a reserved word in other engines and the
    * oracle must spell the same name.)
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    retentionTriangle(userWeeks(events, userCol, tsCol))

  /** Distinct (user, epoch-week) pairs — the MERGEABLE STATE behind
    * streaming retention maintenance, and the first half of
    * [[cohortRetention]] (one definition, so the batch form and the
    * maintained form can never drift). The pair set is the
    * sufficient statistic for the whole triangle: cohorts are
    * per-user minima over it, offsets differences within it. Merge =
    * union + distinct — idempotent, associative, commutative, so
    * micro-batches may land in any order or grouping; state is
    * bounded by users × active weeks, never by stream length.
    */
  def userWeeks(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    events.select(col(userCol).as("__u"),
      expr(s"(unix_millis($tsCol) div 86400000) div 7").as("__wk"))
      .distinct()

  /** The retention triangle off a (user, week) pair set — the finish
    * step shared by [[cohortRetention]] and the streaming
    * maintenance twin. Two user-keyed aggregates and one bounded
    * (cohort, offset) rollup, as before.
    */
  def retentionTriangle(uw: DataFrame): DataFrame = {
    val first = uw.groupBy(col("__u")).agg(min(col("__wk")).as("cohort_wk"))
    uw.join(first, "__u")
      .withColumn("wk_offset", col("__wk") - col("cohort_wk"))
      .groupBy(col("cohort_wk"), col("wk_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
      .orderBy(col("cohort_wk"), col("wk_offset"))
  }

  /** The MERGEABLE STATE behind streaming funnel maintenance: the
    * stream compacted to the funnel's step types, distinct
    * (user, type, ts) rows. Sufficient for every funnel form here —
    * [[orderedFunnel]] and [[windowedFunnel]] both depend only on
    * the SET of step-typed event times per user, so duplicate
    * arrivals can never change an exists-chain answer and merge is
    * plain union + distinct (idempotent, associative, commutative).
    * Finish = run either funnel over the state as the event table;
    * state is bounded by step-typed user activity, not stream
    * length.
    */
  def funnelState(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame =
    events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(typeCol), col(tsCol)).distinct()

  /** Multi-touch conversion attribution — the credit-assignment
    * question funnels don't answer: for each conversion, WHICH
    * preceding touch gets the credit. First-touch, last-touch and
    * linear models computed in one pass: touches inside the
    * `windowMs` lookback of each conversion (strictly before it)
    * rank by (ts, id); linear credit is exact-integer e6 fixed
    * point — `1e6 div n` per touch with the remainder assigned to
    * the LAST touch, so credits sum to exactly 1e6 per converted
    * conversion and the whole model replays in SQL.
    *
    * Scale shape: one user-keyed equi-join (conversions × touches,
    * the time bound as join-condition filter), then a window
    * partitioned by CONVERSION id (high-cardinality — parallel),
    * then a |touch types|-bounded aggregate. Conversions with no
    * in-window touch drop (unattributable).
    */
  def touchAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      convType: String, touchTypes: Seq[String],
      windowMs: Long): DataFrame =
    attributionFromParts(
      conversions(events, userCol, typeCol, tsCol, idCol, convType),
      touches(events, userCol, typeCol, tsCol, idCol, touchTypes),
      windowMs)
      .orderBy(col("touch_type"))

  /** The conversion relation (__u, __tc ms, __cid) — factored so
    * the maintenance twin can split conversions by whether their
    * lookback window crosses a batch boundary.
    */
  def conversions(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      convType: String): DataFrame =
    events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"),
        unix_millis(col(tsCol)).as("__tc"), col(idCol).as("__cid"))

  /** The touch relation (__u, touch_type, __tt ms, __tid). */
  def touches(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String,
      touchTypes: Seq[String]): DataFrame =
    events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("touch_type"),
        unix_millis(col(tsCol)).as("__tt"), col(idCol).as("__tid"))

  /** Attribution core over explicit conversion/touch relations —
    * UNordered summary (callers order); summaries are additive over
    * conversion sets, which is what the maintenance twin's
    * partition-by-boundary merge relies on.
    */
  def attributionFromParts(conv: DataFrame, touch: DataFrame,
      windowMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = conv.join(touch, Seq("__u"))
      .filter(col("__tt") >= col("__tc") - windowMs &&
        col("__tt") < col("__tc"))
    val byConv = Window.partitionBy(col("__cid"))
    val ranked = j
      .withColumn("__rn", row_number().over(
        byConv.orderBy(col("__tt"), col("__tid"))))
      .withColumn("__n", count(lit(1)).over(byConv))
    ranked.groupBy(col("touch_type"))
      .agg(
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("__rn") === col("__n"), 1L).otherwise(0L))
          .as("n_last"),
        sum(expr("1000000L div __n") +
          when(col("__rn") === col("__n"), expr("1000000L % __n"))
            .otherwise(lit(0L))).as("credit_e6"))
  }

  /** First-touch-to-conversion latency distribution — the duration
    * companion to the funnel: per user, the time from the first
    * `fromType` event to the first `toType` event strictly after
    * it, summarized as exact RANK-based percentiles (value at rank
    * `⌈p·n/100⌉` over the (latency, user)-ordered list — no
    * interpolation, no float, so any engine replays it). Users
    * without both events drop.
    *
    * Scale shape: two user-keyed aggregates + one user-keyed join
    * produce ONE latency row per converting user; the rank is then
    * read off the latency-value HISTOGRAM prefix sum (the q233
    * equi-depth shape, `Profiler.equiDepthHistogramFx`) — the
    * value at rank k is the smallest latency whose cumulative
    * count reaches k, identical to ranking user rows because rank
    * ties share a latency value. The only unpartitioned window
    * runs over DISTINCT-latency rows (ms-quantized durations, far
    * below |users| at scale), never over one row per user.
    * Output: one row (n_users, p50_ms, p90_ms, max_ms).
    */
  def conversionLatency(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, fromType: String,
      toType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol))
      .agg(min(unix_millis(col(tsCol))).as("__tv"))
    val lat = events.filter(col(typeCol) === toType)
      .join(first, userCol)
      .filter(unix_millis(col(tsCol)) > col("__tv"))
      .groupBy(col(userCol), col("__tv"))
      .agg(min(unix_millis(col(tsCol))).as("__tp"))
      .select(col(userCol), (col("__tp") - col("__tv")).as("__lat"))
    val hist = lat.groupBy(col("__lat"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__lat"))
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("__c")).as("n_users"))))
      .agg(
        max(col("n_users")).as("n_users"),
        min(when(col("__cum") >=
          expr("(n_users * 50 + 99) div 100"), col("__lat")))
          .as("p50_ms"),
        min(when(col("__cum") >=
          expr("(n_users * 90 + 99) div 100"), col("__lat")))
          .as("p90_ms"),
        max(col("__lat")).as("max_ms"))
  }

  /** SCD type-2 history build — the warehouse primitive that turns
    * an update stream into validity intervals: per key, ordered by
    * (ts, id), collapse no-op updates (same fx-e2 value as the
    * previous row), then each surviving change is valid from its
    * own timestamp until the next change (`valid_to_us` NULL on the
    * current row), with a per-key version number. All integer
    * (epoch MICROS — the ts column's full resolution, so the window
    * order equals true event order; fx-e2 values), fully
    * SQL-replayable.
    *
    * Scale shape: two window passes over the SAME key-partitioned
    * (ts, id) frame — Catalyst plans them into one sort — and a
    * filter between; no joins, no global sort.
    */
  def scd2Intervals(events: DataFrame, keyCol: String,
      valCol: String, tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(idCol))
    val changes = events
      .select(col(keyCol), col(idCol),
        unix_micros(col(tsCol)).as("__us"),
        floor(col(valCol) * 100).cast("long").as("__fx"))
      .withColumn("__prev", lag(col("__fx"), 1).over(w))
      .filter(col("__prev").isNull || col("__fx") =!= col("__prev"))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_us", lead(col("__us"), 1).over(w))
      .select(col(keyCol), col("version"),
        col("__fx").as("value_fx"), col("__us").as("valid_from_us"),
        col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }
}
