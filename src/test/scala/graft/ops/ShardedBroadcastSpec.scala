package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions

class ShardedBroadcastSpec extends SparkSpec {
  import spark.implicits._

  test("shards at the requested element count") {
    val shards = ShardedBroadcast(spark.sparkContext,
      (1 to 10).map(_.toString), shardSize = 3)
    assert(shards.map(_.value.length) == Seq(3, 3, 3, 1))
    assert(shards.flatMap(_.value) == (1 to 10).map(_.toString))
  }

  test("empty input broadcasts one empty shard") {
    val shards = ShardedBroadcast(spark.sparkContext, Seq.empty[String])
    assert(shards.length == 1 && shards.head.value.isEmpty)
  }

  test("dict membership spans shard boundaries") {
    val d = ShardedBroadcast.dict(spark.sparkContext,
      Seq("alpha", "beta", "gamma", "delta", "epsilon"), shardSize = 2)
    assert(d.contains("alpha"))   // first shard
    assert(d.contains("gamma"))   // middle shard
    assert(d.contains("epsilon")) // last, partial shard
    assert(!d.contains("zeta"))
  }

  test("dictMatchSharded agrees with the inline dictMatch") {
    val dictWords = Seq("fox", "quick", "cat", "dog")
    val docs = Seq("the quick brown fox", "no hits here",
      "dog dog cat").toDF("t")
      .select(TextFunctions.tokens(col("t")).as("toks"))
    val d = ShardedBroadcast.dict(spark.sparkContext, dictWords,
      shardSize = 2)
    val sharded = docs
      .select(ShardedBroadcast.dictMatchSharded(col("toks"), d).as("g"))
      .as[Seq[String]].collect().toSeq
    val inline = docs
      .select(TextFunctions.dictMatch(col("toks"), dictWords).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(sharded == inline)
    assert(sharded == Seq(Seq("fox", "quick"), Seq(), Seq("cat", "dog")))
  }

  test("size estimate is positive and scales with the payload") {
    val small = ShardedBroadcast.estimateGb(Seq.fill(10)("x"))
    val big = ShardedBroadcast.estimateGb(Seq.fill(10000)("x" * 100))
    assert(small > 0.0 && big > small)
  }
}
