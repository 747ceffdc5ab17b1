package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // adversarial mix: one 40% key, five ~4% keys, and a long tail of
  // singletons — the tail is what forces constant MG eviction
  private def fixture = {
    val heavy = Seq.fill(4000)(0L)
    val mids = (1L to 5L).flatMap(k => Seq.fill(400)(k))
    val tail = (1000L until 5000L).toSeq
    spark.sparkContext.parallelize(heavy ++ mids ++ tail, 7).toDF("k")
  }

  test("certified output equals the plain HAVING-count aggregate") {
    val cap = 8
    val got = HeavyHitters.certified(fixture, "k", cap)
      .as[(Long, Long)].collect().toSeq
    val df = fixture
    val n = df.count()
    val want = df.groupBy($"k").agg(count(lit(1)).as("n"))
      .filter($"n" * cap > n)
      .orderBy($"n".desc, $"k")
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty && got.head._1 == 0L, s"got $got")
  }

  test("certified output is exact under a capacity that forces heavy eviction") {
    // capacity 4 over 4000+ distinct keys: the summaries churn
    // constantly, but every key with n*4 > N must survive somewhere
    val cap = 4
    val got = HeavyHitters.certified(fixture, "k", cap)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4000L)), s"got $got")
  }

  test("candidate union is bounded by partitions × capacity") {
    val keyed = fixture.select($"k".cast("long")
      .as[java.lang.Long](org.apache.spark.sql.Encoders.LONG))
    val parts = keyed.rdd.getNumPartitions
    val nCands = HeavyHitters.candidates(keyed, 8).count()
    assert(nCands <= parts.toLong * 8, s"$nCands candidates, $parts parts")
  }

  test("non-integral keys are rejected loudly") {
    val strs = Seq("a", "b").toDF("k")
    intercept[IllegalArgumentException] {
      HeavyHitters.certified(strs, "k", 8)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.certified(fixture, "k", 0)
    }
  }
}
