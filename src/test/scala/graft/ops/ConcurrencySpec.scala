package graft.ops

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** The naive single-partition sweep the banded form replaces —
    * kept here as the proof twin (the q126 PackingSpec shape).
    */
  private def naivePeak(intervals: DataFrame): (Long, Long, Long) = {
    val d = intervals
      .select(unix_micros(col("s")).as("t"), lit(1L).as("delta"))
      .unionByName(intervals
        .select(unix_micros(col("e")).as("t"), lit(-1L).as("delta")))
    val sweep = Window.orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val r = d.withColumn("running", sum(col("delta")).over(sweep))
    val peak = r.agg(max(col("running"))).as[Long].head()
    val at = r.filter(col("running") === peak)
      .agg(min(col("t"))).as[Long].head()
    (intervals.count(), peak, at)
  }

  test("peakConcurrency: inclusive ends — touching intervals overlap") {
    val iv = Seq((ts(0), ts(10)), (ts(10), ts(20)))
      .toDF("s", "e")
    val out = Concurrency.peakConcurrency(iv, "s", "e")
      .as[(Long, Long, Long)].head()
    assert(out == ((2L, 2L, 10000000L)))
  }

  test("peakConcurrency: earliest peak microsecond, not any peak") {
    // peak 2 reached at t=5 and again at t=30 — must report 5
    val iv = Seq((ts(0), ts(10)), (ts(5), ts(8)),
      (ts(25), ts(40)), (ts(30), ts(35))).toDF("s", "e")
    val out = Concurrency.peakConcurrency(iv, "s", "e")
      .as[(Long, Long, Long)].head()
    assert(out == ((4L, 2L, 5000000L)))
  }

  test("peakConcurrency: banded prefix sum equals the naive global sweep " +
      "across band widths, including bands splitting the peak") {
    val rnd = new Random(12)
    val iv = (1 to 400).map { _ =>
      val s = rnd.nextInt(100000).toLong
      (ts(s), ts(s + 1 + rnd.nextInt(5000)))
    }.toDF("s", "e")
    val expected = naivePeak(iv)
    // 1 s bands (thousands of bands, ties within), 1 h default, and
    // one band swallowing everything — identical by construction
    for (bw <- Seq(1000000L, 3600L * 1000000L, Long.MaxValue / 4)) {
      val got = Concurrency.peakConcurrency(iv, "s", "e", bw)
        .as[(Long, Long, Long)].head()
      assert(got == expected, s"bandWidthUs=$bw")
    }
  }

  test("peakConcurrency: an interval with a NULL endpoint is excluded " +
      "whole — from the count and from the sweep") {
    // (0,10) and (5,8) overlap → peak 2 at t=5; the NULL-ended rows
    // must not contribute their non-null endpoint as a stray ±1
    // (which would also leave an odd delta count truncated by /2)
    val iv = Seq((Some(ts(0)), Some(ts(10))), (Some(ts(5)), Some(ts(8))),
      (Some(ts(3)), None), (None, Some(ts(6))), (None, None))
      .toDF("s", "e")
    val out = Concurrency.peakConcurrency(iv, "s", "e")
      .as[(Long, Long, Long)].head()
    assert(out == ((2L, 2L, 5000000L)))
  }

  test("peakConcurrency: plan has no unpartitioned sort over delta rows") {
    val iv = Seq((ts(0), ts(10)), (ts(5), ts(8))).toDF("s", "e")
    val plan = Concurrency.peakConcurrency(iv, "s", "e")
      .queryExecution.executedPlan.toString
    // every window sort must carry the band partition key; the only
    // global-order window allowed is the bounded band-carry (its
    // input is the per-band aggregate, grouped by __b)
    val globalSorts = plan.linesIterator
      .filter(_.contains("Sort ["))
      .filterNot(_.contains("__b#"))
      .toList
    assert(globalSorts.isEmpty, s"unbanded sorts: $globalSorts")
  }
}
