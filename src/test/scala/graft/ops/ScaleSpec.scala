package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-technique specs: salting and bucketed co-located joins —
  * the SURVEY §2.8/§4 physical patterns that only show up in plans,
  * not results.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(_ => ("hot", "x")) ++
      (1 to 100).map(i => (s"k$i", "y"))).toDF("k", "v")
    val right = (Seq(("hot", 1)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "w")
    val plain = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Relational.saltedJoin(left, right, Seq("k"), buckets = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
    assert(salted.exists { case (k, n, _) => k == "hot" && n == 900L })
  }

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    val left = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val salts = left
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4) // rows of the hot key land in many buckets
  }

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse dir (./spark-warehouse); tables dropped below
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "av")
    val b = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "bv")
    a.write.mode("overwrite").bucketBy(4, "id").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(4, "id").saveAsTable("bkt_b")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: sort-merge join reads both sides bucket-by-bucket
      // with no ShuffleExchange above either scan
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 1000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
