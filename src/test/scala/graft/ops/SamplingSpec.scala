package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample: deterministic, no replacement, k rows") {
    val df = (1L to 1000L).map(i => (i, 1.0 + (i % 7))).toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", col("w"), k = 50, seed = 3)
      .as[(Long, Double, Long)].collect().toList
    val s2 = Sampling.weightedSample(df, "id", col("w"), k = 50, seed = 3)
      .as[(Long, Double, Long)].collect().toList
    assert(s1 == s2)
    assert(s1.size == 50)
    assert(s1.map(_._1).distinct.size == 50)
    // a different seed draws a different sample
    val s3 = Sampling.weightedSample(df, "id", col("w"), k = 50, seed = 4)
      .as[(Long, Double, Long)].collect().toList
    assert(s3.map(_._1) != s1.map(_._1))
  }

  test("weightedSample: heavy weights dominate the draw") {
    // 100 heavy items (w=1000) among 900 light (w=1): at k=50 the
    // sample should be nearly all heavy — deterministic under the
    // seed, so the exact count is stable
    val df = (1L to 1000L).map(i => (i, if (i <= 100) 1000.0 else 1.0))
      .toDF("id", "w")
    val s = Sampling.weightedSample(df, "id", col("w"), k = 50, seed = 11)
      .as[(Long, Double, Long)].collect()
    val heavy = s.count(_._1 <= 100L)
    assert(heavy >= 45, s"heavy=$heavy of 50")
  }

  test("weightedSample: k >= n returns everything with positive weight") {
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, 5.0), (4L, -1.0)).toDF("id", "w")
    val s = Sampling.weightedSample(df, "id", col("w"), k = 10, seed = 1)
      .as[(Long, Double, Long)].collect()
    // zero / negative weights are excluded (ES undefined there)
    assert(s.map(_._1).toSet == Set(1L, 3L))
  }

  test("esKeyE9 replays the documented expression bit-for-bit") {
    // hand-replay for one row: h = first 12 hex chars of md5("5:42")
    val df = Seq((42L, 3.0)).toDF("id", "w")
    val got = df.select(Sampling.esKeyE9(col("id"), col("w"), 5))
      .as[Long].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("5:42".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex, 16)
    val expected =
      math.floor(1000000000.0 * math.log((h + 1.0) / 281474976710656.0) / 3.0)
        .toLong
    assert(got == expected)
  }
}
