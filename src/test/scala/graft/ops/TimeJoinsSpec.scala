package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def clicks = Seq(
    (10L, 1L, ts("2024-01-01 10:00:00")),  // before any purchase
    (11L, 1L, ts("2024-01-01 12:00:00")),  // after p1
    (12L, 1L, ts("2024-01-01 14:00:00")),  // exactly at p2 → includes p2
    (13L, 2L, ts("2024-01-01 09:00:00"))   // user with no purchases
  ).toDF("event_id", "user_id", "ts")

  private def purchases = Seq(
    (100L, 1L, ts("2024-01-01 11:00:00"), 5.0),
    (101L, 1L, ts("2024-01-01 14:00:00"), 7.0)
  ).toDF("p_event", "user_id", "ts", "p_value")
    .select($"user_id", $"ts", $"p_event", $"p_value")

  test("asofJoin picks latest right row at or before each left time") {
    val out = TimeJoins.asofJoin(clicks, purchases, "user_id", "ts")
      .select($"event_id", $"p_event", $"p_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .sortBy(_._1)
    assert(out(0) == ((10L, None, None)))              // nothing prior
    assert(out(1) == ((11L, Some(100L), Some(5.0))))   // p1 latest
    assert(out(2) == ((12L, Some(101L), Some(7.0))))   // tie at 14:00 → p2
    assert(out(3) == ((13L, None, None)))              // other user
  }

  test("asofJoin null payload field does not reach back to older rows") {
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), Some("early"), 1.0),
      (1L, ts("2024-01-01 13:00:00"), None: Option[String], 2.0)
    ).toDF("user_id", "ts", "tag", "amt")
    val left = Seq((50L, 1L, ts("2024-01-01 15:00:00")))
      .toDF("event_id", "user_id", "ts")
    val row = TimeJoins.asofJoin(left, right, "user_id", "ts")
      .select($"tag", $"amt").as[(Option[String], Double)].head()
    // latest right row wins as a unit: its null tag stays null
    assert(row == ((None, 2.0)))
  }

  test("rangeJoinBucketed equals the naive range join") {
    val rows = spark.range(1000).toDF("id")
      .select($"id", ($"id" * 7 % 997).cast("double").as("v"))
    val intervals = Seq((0L, 10.0, 130.0), (1L, 100.0, 220.0),
      (2L, 950.0, 1000.0)).toDF("iv_id", "lo", "hi")
    val bucketed = TimeJoins.rangeJoinBucketed(
      rows, "v", intervals, "lo", "hi", bucketWidth = 100.0)
      .select($"id", $"iv_id").as[(Long, Long)].collect().toSet
    val naive = rows.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
      .select($"id", $"iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("rangeJoinBucketed produces no duplicate pairs") {
    val rows = Seq((1L, 50.0)).toDF("id", "v")
    // interval spans many buckets; the point must still match once
    val intervals = Seq((9L, 0.0, 1000.0)).toDF("iv_id", "lo", "hi")
    val out = TimeJoins.rangeJoinBucketed(
      rows, "v", intervals, "lo", "hi", bucketWidth = 10.0)
    assert(out.count() == 1)
  }

  test("asofJoinBucketed equals asofJoin across bucket boundaries") {
    // deterministic pseudo-random event set: one hot key (0) plus
    // sparse keys; times span many 60 s buckets; some buckets have
    // left rows but no right rows, forcing the carry-in path
    val base = ts("2024-01-01 00:00:00").getTime
    val lrows = (0 until 300).map { i =>
      val key = if (i % 3 != 0) 0L else (i % 7).toLong
      (i.toLong, key, new Timestamp(base + (i * 37 % 500) * 13000L))
    }
    val rrows = (0 until 80).map { i =>
      val key = if (i % 2 == 0) 0L else (i % 7).toLong
      (key, new Timestamp(base + (i * 101 % 400) * 17000L),
        (1000 + i).toLong, i * 1.5)
    }.distinct
    val lf = lrows.toDF("event_id", "user_id", "ts")
    val rf = rrows.toDF("user_id", "ts", "p_event", "p_value")
      .dropDuplicates("user_id", "ts") // precondition: unique (key, time)
    val plain = TimeJoins.asofJoin(lf, rf, "user_id", "ts")
      .select($"event_id", $"p_event", $"p_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    val bucketed = TimeJoins.asofJoinBucketed(lf, rf, "user_id", "ts",
      bucketWidthSec = 60)
      .select($"event_id", $"p_event", $"p_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(bucketed == plain)
    // sanity: both the in-bucket and the carry-in path were exercised
    assert(plain.exists(_._2.isDefined))
  }

  test("asofJoinBucketed with empty right side yields all-null payload") {
    val out = TimeJoins.asofJoinBucketed(clicks,
      purchases.filter($"p_event" < 0), "user_id", "ts",
      bucketWidthSec = 3600)
      .select($"event_id", $"p_event").as[(Long, Option[Long])].collect()
    assert(out.length == 4)
    assert(out.forall(_._2.isEmpty))
  }

  // Plan-shape regressions: the scale claims of these operators are
  // properties of the physical plan, so pin them — a refactor that
  // reintroduces a nested loop or a second shuffle should fail here,
  // not at 100 TB.

  test("asofJoin plans one shuffle and no nested loop") {
    val plan = TimeJoins.asofJoin(clicks, purchases, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), "as-of must not nested-loop")
    assert(!plan.contains("CartesianProduct"))
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(shuffles == 1,
      s"expected exactly one key shuffle, got $shuffles:\n$plan")
  }

  test("rangeJoinBucketed plans a hash join on the bucket, never cartesian") {
    val rows = spark.range(100).toDF("id")
      .select($"id", ($"id" * 3.0).as("v"))
    val intervals = Seq((0L, 10.0, 130.0), (1L, 100.0, 220.0))
      .toDF("iv_id", "lo", "hi")
    val plan = TimeJoins.rangeJoinBucketed(
      rows, "v", intervals, "lo", "hi", bucketWidth = 100.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join on the bucket:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
