package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // 400 keys, skewed counts (key i appears i%7+1 times), forced into
  // a tiny 2×32 sketch so collisions genuinely happen
  private def corpus = (1 to 400)
    .flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")

  private def md5Bucket(r: Int, key: String, w: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((r + ":" + key).getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % w
  }

  test("estimates never undercount, and the tiny sketch genuinely collides") {
    val (d, w) = (2, 32)
    // the exact table is the probe set: estimate carries its columns
    // through (one reference, no re-join)
    val exact = corpus.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val est = CountMin.estimate(
      CountMin.sketch(corpus, "k", d, w), exact, "k", d, w)
      .as[(String, Long, Long)].collect() // (k, n, est_n)
    assert(est.length == 400)
    est.foreach { case (k, n, e) => assert(e >= n, s"$k: est $e < true $n") }
    // 400 keys in 32 buckets: overshoot must actually occur
    assert(est.count { case (_, n, e) => e > n } > 300)
  }

  test("sketch is d×w bounded and replays the documented md5 bucketing") {
    val (d, w) = (2, 32)
    val sk = CountMin.sketch(corpus, "k", d, w)
      .as[(Int, Long, Long)].collect()
    assert(sk.length <= d * w)
    assert(sk.map(_._3).sum == 2L * corpus.count())
    // brute-force one key's estimate from the raw counters
    val counters = sk.map(r => (r._1, r._2) -> r._3).toMap
    val est = CountMin.estimate(sk = CountMin.sketch(corpus, "k", d, w),
      probes = Seq("k7").toDF("k"), keyCol = "k", d = d, w = w)
      .as[(String, Long)].collect().head._2
    val brute = (0 until d)
      .map(r => counters.getOrElse((r, md5Bucket(r, "k7", w)), 0L)).min
    assert(est == brute)
  }

  test("merge of slice sketches equals the union sketch exactly") {
    val (d, w) = (3, 64)
    val a = corpus.filter(length(col("k")) === 2)
    val b = corpus.filter(length(col("k")) =!= 2)
    val merged = CountMin.merge(
      CountMin.sketch(a, "k", d, w), CountMin.sketch(b, "k", d, w))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.sketch(corpus, "k", d, w)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }
}
