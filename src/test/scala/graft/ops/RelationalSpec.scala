package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10), (2L, "a", 20), (3L, "b", 30), (4L, "b", 40), (5L, "c", 50)
  ).toDF("id", "cls", "v")

  test("antiJoin removes rows with matching keys") {
    val dropIds = Seq(2L, 4L).toDF("id")
    val out = Relational.antiJoin(base, dropIds, Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L, 5L))
  }

  test("semiJoin keeps only rows with matching keys") {
    val keepIds = Seq(2L, 4L, 99L).toDF("id")
    val out = Relational.semiJoin(base, keepIds, Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 4L))
  }

  test("unionCorrected: corrections replace base rows by key") {
    val corrections = Seq((2L, "a", 999), (6L, "d", 60)).toDF("id", "cls", "v")
    val out = Relational.unionCorrected(base, corrections, Seq("id"))
      .select("id", "v").as[(Long, Int)].collect().toMap
    assert(out(2L) == 999) // corrected
    assert(out(1L) == 10)  // untouched
    assert(out(6L) == 60)  // new row appended
    assert(out.size == 6)
  }

  test("topKPerGroup takes k rows per group in order") {
    val out = Relational.topKPerGroup(base, Seq(col("cls")),
      Seq(col("v").desc), k = 1)
      .select("cls", "v").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 20, "b" -> 40, "c" -> 50))
  }

  test("classBalance caps rows per class") {
    val out = Relational.classBalance(base, "cls", cap = 1, Seq(col("id")))
    assert(out.groupBy("cls").count().as[(String, Long)].collect()
      .forall(_._2 == 1L))
  }

  test("zipWithIndex produces contiguous 1-based ids in sort order") {
    val out = Relational.zipWithIndex(base, "idx", Seq(col("v").desc))
      .select("idx", "id").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) == (1L to 5L))
    assert(out.map(_._2) == Seq(5L, 4L, 3L, 2L, 1L)) // v desc
  }

  test("compositeId is deterministic and distinct per key tuple") {
    val out = Relational.compositeId(base, Seq("id", "cls"))
      .select("composite_id").as[String].collect()
    assert(out.distinct.length == 5)
    val again = Relational.compositeId(base, Seq("id", "cls"))
      .select("composite_id").as[String].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("seeded sample is deterministic and a subset (W6)") {
    val big = spark.range(0, 1000).toDF("id")
    val s1 = big.sample(withReplacement = false, 0.1, seed = 42)
      .as[Long].collect().toSeq
    val s2 = big.sample(withReplacement = false, 0.1, seed = 42)
      .as[Long].collect().toSeq
    assert(s1 == s2)
    assert(s1.nonEmpty && s1.size < 300)
    assert(s1.forall(i => i >= 0 && i < 1000))
  }

  test("dedupExact keeps first row per key by keep order") {
    val dups = base.unionByName(Seq((10L, "a", 20)).toDF("id", "cls", "v"))
    val out = Relational.dedupExact(dups, Seq("cls", "v"), Seq(col("id")))
    assert(out.count() == 5)
    // (a,20) group keeps id=2 (min id)
    assert(out.filter($"cls" === "a" && $"v" === 20)
      .select("id").as[Long].head() == 2L)
  }

  test("approx_count_distinct tracks exact within its error bound (A5)") {
    // HLL++ sketch — the scale path for count-distinct over wide keys
    // (fixed-size state vs a hash set per group). rsd=0.01 → expect
    // well under 5% error on 10k distinct values.
    val df = spark.range(0, 100000).toDF("id")
      .select(($"id" % 10000).as("k"))
    val (approx, exact) = df
      .agg(approx_count_distinct($"k", rsd = 0.01).as("a"),
        countDistinct($"k").as("e"))
      .as[(Long, Long)].head()
    assert(exact == 10000L)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
