package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within KMV's expected error band") {
    // 10k distinct keys (each seen 3x — duplicates must not bias),
    // k=256: relative standard error ~ 1/sqrt(k) ≈ 6%; 4σ band
    val df = (0 until 30000).map(i => i % 10000).toDF("key")
    val (kUsed, _, est) = DistinctSketch.kmv(df, "key", 256)
      .as[(Long, Long, Long)].head()
    assert(kUsed == 256L)
    assert(math.abs(est - 10000L) < 2500, s"estimate $est")
  }

  test("fewer distinct keys than k reports the exact count") {
    val df = (0 until 1000).map(i => i % 10).toDF("key")
    val (kUsed, _, est) = DistinctSketch.kmv(df, "key", 32)
      .as[(Long, Long, Long)].head()
    assert(kUsed == 10L && est == 10L)
  }

  test("deterministic: reruns and repartitionings agree exactly") {
    val df = (0 until 5000).map(i => i % 1234).toDF("key")
    def run(d: org.apache.spark.sql.DataFrame) =
      DistinctSketch.kmv(d, "key", 64).as[(Long, Long, Long)].head()
    val a = run(df.repartition(2))
    val b = run(df.repartition(13))
    val c = run(df)
    assert(a == b && b == c, s"$a $b $c")
  }

  test("at most k values leave each partition") {
    val hashes = (0 until 10000).map(_.toLong).toDF("__h").repartition(5)
    val perPart = DistinctSketch.partitionMins(hashes, 16)
      .rdd.glom().map(_.length).collect()
    assert(perPart.forall(_ <= 16), perPart.mkString(","))
    assert(perPart.sum <= 5 * 16)
  }
}
