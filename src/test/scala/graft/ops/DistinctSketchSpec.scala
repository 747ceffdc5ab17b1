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

  test("overlapReport: exact below k, and union sketch == sketch of union") {
    import org.apache.spark.sql.functions.col
    // small sets (< k distinct): every estimate collapses to the
    // exact value — |A|=40, |B|=30, |A∩B|=10
    val a = (0 until 40).toDF("key")
    val b = (30 until 60).toDF("key")
    val r = DistinctSketch.overlapReport(a, col("key"), b, col("key"),
        k = 64)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((40L, 40L, 30L, 30L, 60L, 60L, 10L, 10L)))

    // large sets: the merged union sketch must equal the sketch of
    // the concatenated data (KMV mergeability is exact, not
    // approximate), so est_u == kmv(A ++ B)
    val la = (0 until 5000).toDF("key")
    val lb = (2500 until 7500).toDF("key")
    val big = DistinctSketch.overlapReport(la, col("key"),
        lb, col("key"), k = 64)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (_, _, estWhole) = DistinctSketch
      .kmv(la.unionByName(lb), "key", 64)
      .as[(Long, Long, Long)].head()
    assert(big._6 == estWhole, s"est_u ${big._6} vs whole $estWhole")
    // and the intersection estimate lands in a generous 4-sigma band
    assert(math.abs(big._8 - 2500L) < 1800, s"est_inter ${big._8}")
  }

  test("at most k values leave each partition") {
    val hashes = (0 until 10000).map(_.toLong).toDF("__h").repartition(5)
    val perPart = DistinctSketch.partitionMins(hashes, 16)
      .rdd.glom().map(_.length).collect()
    assert(perPart.forall(_ <= 16), perPart.mkString(","))
    assert(perPart.sum <= 5 * 16)
  }
}
