package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the quality gate a 100 TB ingest runs
  * BEFORE trusting a new drop of data: per-column null rates,
  * cardinalities and ranges, plus an equi-width histogram for
  * distribution drift checks.
  *
  * Scale shape: [[profile]] is ONE scan — every per-column metric is
  * an aggregate in a single `agg(...)`, unpivoted afterwards with
  * `stack` over the 1-row result (cols × 6 longs; never a second
  * pass, never a per-column job like a naive profiler loop).
  * The exact `countDistinct` set is the one genuinely heavy metric
  * (Spark plans the multi-distinct via Expand: the scan is still
  * read once but the shuffle carries each row ~cols times);
  * [[approxProfile]] swaps in HLL `approx_count_distinct`, which
  * partial-aggregates map-side and shuffles only fixed-size sketches
  * — the form to run at 100 TB, spec-bounded against exact on the
  * test corpus. Money-like doubles are profiled in fx space
  * (`floor(v*100)` longs) so min/max are engine-portable integers.
  */
object Profiler {

  private def fx(c: Column): Column = floor(c * 100).cast("long")

  private def unpivot(one: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c =>
      s"'$c', __rows, __n_$c, __rows - __n_$c, __d_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_present, n_null, n_distinct, min_fx, max_fx)")
      .orderBy(col("col_name"))
  }

  /** Exact one-pass profile of numeric columns: row count, non-null
    * count, null count, exact distinct count, fx-space min/max.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(fx(col(c))).as(s"__min_$c"),
        max(fx(col(c))).as(s"__max_$c"))
    }
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** The 100 TB form: identical shape with HLL sketches for the
    * distinct counts — map-side partials, fixed-size shuffle.
    */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        approx_count_distinct(col(c), rsd).as(s"__d_$c"),
        min(fx(col(c))).as(s"__min_$c"),
        max(fx(col(c))).as(s"__max_$c"))
    }
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** The shared pieces of the batch/stream drift TWINS — one source
    * of truth because their contract is BIT-equality of a floored
    * IEEE expression: a re-derived copy that reorders one multiply
    * would break twin parity in a way only the spec would catch.
    */
  // try_subtract in all three guards below: a min/max pair with
  // opposite signs and a true range beyond Long.MaxValue would make
  // the plain subtraction wrap (or throw under ANSI) and dodge the
  // raise_error; try_subtract yields NULL → predicate NULL → the
  // CASE falls through to the error as intended (ADVICE r12).
  private def clampedBucket(buckets: Int) =
    least(lit(buckets - 1L), greatest(lit(0L),
      expr(s"CASE WHEN try_subtract(__mx, __mn) <= ${Long.MaxValue / buckets - 1} " +
          s"THEN ((__fx - __mn) * $buckets) div (__mx - __mn + 1) " +
          s"ELSE raise_error('bin overflow: range*buckets exceeds " +
          "long — quantize first (ksDriftBinned rule)') END")))

  private def driftTermE6(buckets: Int) = {
    val pr = (col("n_ref") + lit(1.0)) / (col("__tr") + lit(buckets))
    val pc = (col("n_cur") + lit(1.0)) / (col("__tc") + lit(buckets))
    floor((pc - pr) * (pc - pr) / pr * lit(1000000.0)).cast("long")
  }

  private def psiTermE6(buckets: Int) = {
    val pr = (col("n_ref") + lit(1.0)) / (col("__tr") + lit(buckets))
    val pc = (col("n_cur") + lit(1.0)) / (col("__tc") + lit(buckets))
    floor((pc - pr) * log(pc / pr) * lit(1000000.0)).cast("long")
  }

  private def allRowsWindow = org.apache.spark.sql.expressions.Window
    .partitionBy() // bounded: callers only window over ≤B bucket rows
    .rowsBetween(Long.MinValue, Long.MaxValue)

  /** Chi-square distribution drift between a REFERENCE slice and a
    * CURRENT slice of the same numeric column — the monitoring gate
    * that catches a feed silently changing distribution between
    * ingest batches. Bucket edges come from the reference only
    * (1-row broadcast min/max; out-of-range current values clamp
    * into the edge buckets, which is exactly where fresh drift
    * shows), both sides bin with the same exact-integer expression,
    * and the per-bucket χ² term uses Laplace-smoothed proportions so
    * an empty reference bucket never divides by zero:
    *
    *   p_r = (r+1)/(N_r+B),  p_c = (c+1)/(N_c+B)
    *   term = (p_c − p_r)² / p_r,   emitted as floor(term · 1e6)
    *
    * All float math is plain IEEE −,×,÷ in a FIXED left-to-right
    * shape, so the floored fixed-point replays exactly in any engine
    * (the q108 round-tie lesson: floor, never round). Shuffles: two
    * ≤B-row aggregates + one ≤B-row join; corpus rows never move.
    */
  def chiSquareDrift(ref: DataFrame, cur: DataFrame, c: String,
      buckets: Int): DataFrame =
    refEdgedSideBins(ref, cur, c, buckets)
      .withColumn("term_e6", driftTermE6(buckets))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("term_e6"))
      .orderBy(col("bucket"))

  /** Population Stability Index drift over the SAME reference-edged
    * buckets as [[chiSquareDrift]] — the third leg of the drift
    * triad (χ² weights squared gaps by 1/p_ref; PSI weights the raw
    * gap by its log-ratio, the scale monitoring dashboards read as
    * <0.1 stable / 0.1–0.25 shifting / >0.25 drifted):
    *
    *   term = (p_c − p_r) · ln(p_c / p_r), emitted floor(term · 1e6)
    *
    * Laplace smoothing keeps ln total on empty buckets, every term
    * is ≥ 0 (both factors share a sign), and Σ term_e6 / 1e6 is the
    * PSI reading. Same IEEE discipline as the χ² term: fixed
    * left-to-right −,÷,ln,× shape floored per bucket, so any engine
    * replays the integers. Same scale shape too: corpus rows never
    * shuffle, only ≤B bucket rows do.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, c: String,
      buckets: Int): DataFrame =
    refEdgedSideBins(ref, cur, c, buckets)
      .withColumn("term_e6", psiTermE6(buckets))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("term_e6"))
      .orderBy(col("bucket"))

  /** The shared ref-edged side-binning of the χ²/PSI drift pair:
    * bucket edges from the reference only (1-row broadcast), then
    * ONE binning pass over ref ∪ cur with a side tag — a per-side
    * groupBy + full-outer join would re-inline the stats subtree
    * under both sides and the totals aggregate would re-run the
    * whole join pipeline (the q116 re-inlined-subtree trap,
    * plan-audited); the tagged union bins both sides in one
    * aggregate, and the N_r/N_c totals come from an unpartitioned
    * Window over the ≤B bucket rows, never a re-scan.
    */
  private def refEdgedSideBins(ref: DataFrame, cur: DataFrame,
      c: String, buckets: Int): DataFrame = {
    val stats = ref.agg(min(fx(col(c))).as("__mn"), max(fx(col(c))).as("__mx"))
    val tagged = ref.select(fx(col(c)).as("__fx"), lit(0).as("__side"))
      .unionByName(cur.select(fx(col(c)).as("__fx"), lit(1).as("__side")))
    tagged
      .crossJoin(broadcast(stats))
      .withColumn("bucket", clampedBucket(buckets))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("n_cur"))
      .withColumn("__tr", sum(col("n_ref")).over(allRowsWindow))
      .withColumn("__tc", sum(col("n_cur")).over(allRowsWindow))
  }

  /** Two-sample Kolmogorov–Smirnov drift between a REFERENCE slice
    * and a CURRENT slice — the bucket-free companion to
    * [[chiSquareDrift]]: no edges to choose, sensitive to location
    * shifts a coarse histogram can smear away. The statistic
    *
    *   D = max over v of |F_ref(v) − F_cur(v)|
    *
    * is computed entirely in integers: with prefix counts c_r, c_c
    * and totals N_r, N_c, the max of |c_r·N_c − c_c·N_r| over the
    * distinct fx values IS D·N_r·N_c exactly, emitted as
    * `d_e6 = D_num·10⁶ div (N_r·N_c)` (decimal-widened products —
    * the cross terms pass a long well before the corpus does).
    *
    * Scale shape: one tagged-union binning aggregate bounded by the
    * value DOMAIN (distinct fx values, not corpus rows), then the
    * prefix/total windows run over those domain-bounded rows —
    * corpus rows never move. NULL when either side is empty (D is
    * undefined, and both engines must say so).
    *
    * The "domain-bounded" contract is GUARDED, not honor-system: the
    * prefix windows are a single-partition sort over the distinct fx
    * values, which on a near-unique column (epoch millis, raw
    * doubles) silently becomes a corpus-sized sort. An eager
    * HLL estimate (map-side partials, one cheap pre-pass) refuses
    * loudly past `domainCap` and points at [[ksDriftBinned]], the
    * valid-gate fallback for such columns.
    */
  def ksDrift(ref: DataFrame, cur: DataFrame, c: String,
      domainCap: Long = 1L << 16): DataFrame = {
    val tagged = taggedFx(ref, cur, c)
    val est = tagged.agg(approx_count_distinct(col("__fx"), 0.02))
      .head().getLong(0)
    require(est <= domainCap,
      s"ksDrift: ~$est distinct fx values in '$c' exceed " +
        s"domainCap=$domainCap; the exact KS prefix sums would sort " +
        "that many rows in one partition — use ksDriftBinned (KS on " +
        "quantized values is still a valid drift gate) or raise the " +
        "cap deliberately")
    ksCore(sideCounts(tagged, col("__fx")))
  }

  /** The high-cardinality fallback: quantize fx into `buckets`
    * equi-width bins (edges from the tagged union's min/max — a
    * 1-row broadcast, the stats-then-sweep shape every binning
    * operator here shares) and run the identical KS machinery over
    * the bin index. Binning only COARSENS the ECDF comparison
    * (D_binned ≤ D exactly; with buckets ≥ the fx range it
    * degenerates to [[ksDrift]] bit-for-bit — spec-pinned), so a
    * drift alarm from the binned gate is always real. The windows
    * are now bounded by `buckets` regardless of column cardinality.
    */
  def ksDriftBinned(ref: DataFrame, cur: DataFrame, c: String,
      buckets: Int = 1 << 16): DataFrame = {
    val tagged = taggedFx(ref, cur, c)
    val stats = tagged.agg(min(col("__fx")).as("__mn"),
      max(col("__fx")).as("__mx"))
    val quantized = tagged.crossJoin(broadcast(stats))
      .withColumn("__b",
        expr(s"CASE WHEN try_subtract(__mx, __mn) <= ${Long.MaxValue / buckets - 1} " +
          s"THEN ((__fx - __mn) * $buckets) div (__mx - __mn + 1) " +
          s"ELSE raise_error('bin overflow: range*buckets exceeds " +
          "long — quantize first (ksDriftBinned rule)') END"))
    ksCore(sideCounts(quantized, col("__b")))
  }

  private def taggedFx(ref: DataFrame, cur: DataFrame,
      c: String): DataFrame =
    ref.select(fx(col(c)).as("__fx"), lit(0).as("__side"))
      .unionByName(cur.select(fx(col(c)).as("__fx"), lit(1).as("__side")))
      // the ECDF is undefined over NULLs, and the engines disagree on
      // where a NULL group sorts (Spark NULLS FIRST asc, most SQL
      // engines last) — dropping them keeps the prefix sums and the
      // totals identical everywhere
      .filter(col("__fx").isNotNull)

  private def sideCounts(tagged: DataFrame, key: Column): DataFrame =
    tagged.groupBy(key.as("__k"))
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__r"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__c"))

  private def ksCore(binned: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy().orderBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, 0)
    binned
      .withColumn("__cr", sum(col("__r")).over(ord))
      .withColumn("__cc", sum(col("__c")).over(ord))
      .withColumn("__nr", sum(col("__r")).over(allRowsWindow))
      .withColumn("__nc", sum(col("__c")).over(allRowsWindow))
      .agg(
        max(col("__nr")).as("n_ref"),
        max(col("__nc")).as("n_cur"),
        max(abs(col("__cr").cast("decimal(38,0)") * col("__nc")
          - col("__cc").cast("decimal(38,0)") * col("__nr"))).as("__dnum"))
      .select(
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        expr("CASE WHEN coalesce(n_ref, 0) = 0 OR coalesce(n_cur, 0) = 0" +
          " THEN NULL ELSE __dnum * 1000000" +
          " div (cast(n_ref as decimal(38,0)) * n_cur) END").as("d_e6"))
  }

  /** The offline half of STREAMING drift monitoring: the reference
    * histogram as a bounded artifact (≤B rows), each row carrying
    * the binning stats and the reference total — everything
    * [[driftAgainst]] needs without ever re-scanning the reference.
    * Persist this between batches; it is tens of rows.
    */
  def referenceHistogram(ref: DataFrame, c: String,
      buckets: Int): DataFrame = {
    val stats = ref.agg(min(fx(col(c))).as("__mn"), max(fx(col(c))).as("__mx"))
    ref.select(fx(col(c)).as("__fx"))
      .crossJoin(broadcast(stats))
      .withColumn("bucket", clampedBucket(buckets))
      .groupBy(col("bucket"), col("__mn"), col("__mx"))
      .agg(count(lit(1)).as("n_ref"))
      .withColumn("__tr", sum(col("n_ref")).over(allRowsWindow))
  }

  /** Chi-square drift of ONE batch (or micro-batch) against a
    * precomputed [[referenceHistogram]] — [[chiSquareDrift]]'s
    * stream-friendly twin: the reference never re-scans, only `cur`
    * does, so a `foreachBatch` can run this per micro-batch at
    * per-batch cost (see `streaming.Streams.driftMonitorStream`).
    * Result equality with the batch form is spec-pinned.
    */
  def driftAgainst(refHist: DataFrame, cur: DataFrame, c: String,
      buckets: Int): DataFrame =
    againstBins(refHist, cur, c, buckets)
      .withColumn("term_e6", driftTermE6(buckets))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("term_e6"))
      .orderBy(col("bucket"))

  /** [[psiDrift]]'s stream-friendly twin against a precomputed
    * [[referenceHistogram]] — same contract as [[driftAgainst]]:
    * only `cur` scans, result equality with the batch form is
    * spec-pinned bit-for-bit (shared term expression).
    */
  def psiAgainst(refHist: DataFrame, cur: DataFrame, c: String,
      buckets: Int): DataFrame =
    againstBins(refHist, cur, c, buckets)
      .withColumn("term_e6", psiTermE6(buckets))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("term_e6"))
      .orderBy(col("bucket"))

  private def againstBins(refHist: DataFrame, cur: DataFrame,
      c: String, buckets: Int): DataFrame = {
    val stats = refHist.agg(max(col("__mn")).as("__mn"),
      max(col("__mx")).as("__mx")) // constant across the ≤B rows
    val curHist = cur.select(fx(col(c)).as("__fx"))
      .crossJoin(broadcast(stats))
      .withColumn("bucket", clampedBucket(buckets))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_cur"))
    val w = allRowsWindow
    refHist.select(col("bucket"), col("n_ref"), col("__tr"))
      .join(curHist, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      // a cur-only bucket has a null reference total — the total is
      // constant on every reference row, so the bounded window max
      // restores it without touching the reference data again
      .withColumn("__tr", max(col("__tr")).over(w))
      .withColumn("__tc", sum(col("n_cur")).over(w))
  }

  /** Equi-width histogram over `c` in fx space: min/max from a 1-row
    * broadcast aggregate (the stats-then-sweep two-pass every layout
    * / binning operator shares), bucket by EXACT integer arithmetic
    * — `(fx - mn) * buckets div (mx - mn + 1)` lands in
    * 0..buckets-1 with no clamp and no floats, so any engine
    * reproduces the binning bit-for-bit. One shuffle of ≤ `buckets`
    * partial rows.
    */
  def histogramFx(df: DataFrame, c: String, buckets: Int): DataFrame = {
    val stats = df.agg(min(fx(col(c))).as("__mn"), max(fx(col(c))).as("__mx"))
    df.select(fx(col(c)).as("__fx"))
      .crossJoin(broadcast(stats))
      .withColumn("bucket",
        expr(s"CASE WHEN try_subtract(__mx, __mn) <= ${Long.MaxValue / buckets - 1} " +
          s"THEN ((__fx - __mn) * $buckets) div (__mx - __mn + 1) " +
          s"ELSE raise_error('bin overflow: range*buckets exceeds " +
          "long — quantize first (ksDriftBinned rule)') END"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__fx")).as("lo_fx"), max(col("__fx")).as("hi_fx"))
      .orderBy(col("bucket"))
  }

  /** Pairwise Pearson correlation screen — the feature-selection
    * readout over a table's numeric columns: every pair's r from
    * ONE corpus aggregate carrying all the moment sums (Σx, Σx²,
    * Σxy per pair) in decimal-widened integers over fx-e2 values.
    * The only floating point is the final fixed-form expression
    * (decimal→double casts are IEEE round-nearest in any engine,
    * sqrt correctly rounded), floored e6; zero-variance columns
    * yield NULL under an explicit guard, not a division error.
    *
    * Scale shape: one map-side-combined aggregate (k + k + k(k−1)/2
    * sums on the wire), then the pair rows unfold from the single
    * 1-row result inside one Project — the corpus is scanned once
    * for ALL pairs.
    */
  def pearsonScreenFx(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    def nm(c: String) = c.replaceAll("[^A-Za-z0-9]", "_")
    val sums =
      Seq(count(lit(1)).cast("decimal(38,0)").as("__n")) ++
      cols.map(c => sum(fx(col(c)).cast("decimal(38,0)"))
        .as(s"__s_${nm(c)}")) ++
      cols.map(c => sum((fx(col(c)) * fx(col(c)))
        .cast("decimal(38,0)")).as(s"__ss_${nm(c)}")) ++
      (for (i <- cols.indices; j <- i + 1 until cols.size) yield
        sum((fx(col(cols(i))) * fx(col(cols(j))))
          .cast("decimal(38,0)"))
          .as(s"__sp_${nm(cols(i))}_${nm(cols(j))}"))
    val agg1 = df.agg(sums.head, sums.tail: _*)
    val pairRows = for (i <- cols.indices; j <- i + 1 until cols.size)
      yield {
        val (a, b) = (nm(cols(i)), nm(cols(j)))
        struct(lit(cols(i)).as("x_col"), lit(cols(j)).as("y_col"),
          expr(
            s"""case when __n * __ss_$a - __s_$a * __s_$a = 0
               |      or __n * __ss_$b - __s_$b * __s_$b = 0 then null
               |else cast(floor(
               |  cast(__n * __sp_${a}_$b - __s_$a * __s_$b as double)
               |  / sqrt(cast(__n * __ss_$a - __s_$a * __s_$a as double)
               |       * cast(__n * __ss_$b - __s_$b * __s_$b as double))
               |  * 1000000.0) as bigint) end""".stripMargin)
            .as("r_e6"))
      }
    agg1.select(explode(array(pairRows: _*)).as("__p"))
      .select(col("__p.x_col"), col("__p.y_col"), col("__p.r_e6"))
      .orderBy(col("x_col"), col("y_col"))
  }

  /** EQUI-DEPTH histogram — the optimizer-stats companion to
    * [[histogramFx]]'s equi-width bins: each bucket holds ≈ N/B
    * rows, so skewed columns get narrow buckets where the mass is
    * (the selectivity-estimation shape ANALYZE computes). A distinct
    * value belongs to bucket `(cum_before · B) div N` — an exact
    * integer rule over the value-count prefix sums, so whole value
    * runs never split across buckets and any engine replays the
    * bounds bit-for-bit.
    *
    * Scale shape: the q187 family contract — one map-side-combined
    * (fx, count) aggregate whose exchange is bounded by the DOMAIN,
    * then the prefix-sum window over those ≤domain rows. For
    * near-unique columns quantize first (ksDriftBinned's rule).
    */
  def equiDepthHistogramFx(df: DataFrame, c: String,
      buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy().orderBy(col("__fx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(fx(col(c)).as("__fx"))
      .groupBy(col("__fx")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(ord))
      .withColumn("__tot", sum(col("__cnt")).over(allRowsWindow))
      .withColumn("bucket",
        expr(s"((__cum - __cnt) * $buckets) div __tot"))
      .groupBy(col("bucket"))
      .agg(sum(col("__cnt")).as("n"),
        min(col("__fx")).as("lo_fx"), max(col("__fx")).as("hi_fx"))
      .orderBy(col("bucket"))
  }
}
