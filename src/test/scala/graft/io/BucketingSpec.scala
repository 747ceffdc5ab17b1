package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def writePair(): (String, String) = {
    val base = Files.createTempDirectory("graft-bucket").toString
    val l = (1L to 2000L).map(k => (k, s"p$k")).toDF("k", "attr")
    val r = (1L to 6000L).map(i => (i % 2000 + 1, i * 1.5)).toDF("k2", "v")
    Bucketing.writeBucketed(l, "graft_spec_left", s"$base/l", "k", 4)
    Bucketing.writeBucketed(r, "graft_spec_right", s"$base/r", "k2", 4)
    ("graft_spec_left", "graft_spec_right")
  }

  test("co-located join has no Exchange and no Sort on either side") {
    // the technique targets large-×-large joins; the toy fixture
    // would auto-broadcast, so pin the shuffle-join path explicitly
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (lt, rt) = writePair()
      val j = Bucketing.colocatedJoin(spark, lt, rt, "k", "k2")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), plan.take(1500))
      assert(plan.contains("Bucketed: true"), plan.take(1500))
      // a partition-local Sort remains: Spark 3+ ignores bucket sort
      // metadata unless the legacy outputOrdering conf is set — the
      // EXCHANGE elimination is the scale win, the local sort is
      // cheap and spill-free per bucket
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result equals the plain join") {
    val (lt, rt) = writePair()
    val bucketed = Bucketing.colocatedJoin(spark, lt, rt, "k", "k2")
      .select($"k", $"attr", $"v")
      .as[(Long, String, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val l = (1L to 2000L).map(k => (k, s"p$k")).toDF("k", "attr")
    val r = (1L to 6000L).map(i => (i % 2000 + 1, i * 1.5)).toDF("k2", "v")
    val plain = l.join(r, $"k" === $"k2").select($"k", $"attr", $"v")
      .as[(Long, String, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(bucketed == plain)
  }
}
