package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Snapshots.diff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff plan shuffles digests, not text") {
    // non-literal inputs — a LocalRelation of literals would let the
    // optimizer constant-fold the digests away
    def snap = spark.range(4).select(col("id").as("doc_id"),
      concat(lit("t"), col("id")).as("text"))
    val v1 = snap
    val v2 = snap
    val plan = Snapshots.diff(v1, v2, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // the projection below each join side must already be digested:
    // no raw text column survives into the join
    assert(plan.contains("md5"))
    val joinLine = plan.linesIterator.find(_.contains("Join")).get
    assert(!joinLine.contains("text"))
  }
}
