package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val mBits = 1 << 10 // deliberately small so fps occur
  private val kH = 3

  test("no false negatives: every build key passes its own bloom") {
    val build = (1L to 500L).toDF("k")
    val words = Bloom.fitWords(Bloom.positions(build, "k", mBits, kH), mBits)
    val misses = build
      .filter(!Bloom.containsCol(words, mBits, kH, col("k"))).count()
    assert(misses == 0L)
  }

  test("kernel equals the declarative positions-join twin, fps included") {
    val build = (1L to 400L).toDF("k")
    val probe = (1L to 2000L).toDF("k")
    val pos = Bloom.positions(build, "k", mBits, kH)
    val words = Bloom.fitWords(pos, mBits)
    val viaKernel = probe
      .filter(Bloom.containsCol(words, mBits, kH, col("k")))
      .as[Long].collect().toSet
    // declarative twin: a key passes iff ALL k of its positions
    // appear in the build position set
    val probePos = probe.select(col("k"), explode(array(
      (0 until kH).map(i => Bloom.bitPos(col("k"), i, mBits)): _*)).as("__p"))
    val viaJoin = probePos.join(pos, Seq("__p"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") === kH)
      .select("k").as[Long].collect().toSet
    assert(viaKernel == viaJoin)
    // the tiny filter genuinely false-fires on this load factor —
    // the equality above covers real fps, not just the seen set
    assert(viaKernel.exists(_ > 400L),
      "expected at least one false positive at this fill")
    assert((1L to 400L).toSet.subsetOf(viaKernel))
  }

  test("prunedSemiJoin equals the plain semi-join: fps never reach the result") {
    val build = (1L to 300L).map(i => (i, s"b$i")).toDF("k", "tag")
    val probe = (1L to 3000L).map(i => (i, i * 2.0)).toDF("k", "v")
    val pruned = Bloom.prunedSemiJoin(probe, "k", build, "k", mBits, kH)
      .as[(Long, Double)].collect().toSet
    val plain = probe.join(build.select("k").distinct(), Seq("k"), "left_semi")
      .as[(Long, Double)].collect().toSet
    assert(pruned == plain)
    assert(plain.size == 300)
  }

  test("the packed artifact is bounded by mBits/64 words") {
    val build = (1L to 5000L).toDF("k") // >> mBits: saturating fill
    val words = Bloom.fitWords(Bloom.positions(build, "k", mBits, kH), mBits)
    assert(words.length == mBits / 64)
  }
}
