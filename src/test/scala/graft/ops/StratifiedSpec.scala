package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StratifiedSpec extends SparkSpec {
  import spark.implicits._

  test("largest-remainder allocation: hand case, sums to k exactly") {
    // counts {a:5, b:3, c:2}, k=7, N=10: bases 3/2/1 (sum 6, one
    // short); remainders a=5, c=4, b=1 -> the +1 goes to a.
    val counts = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("g", "c")
    val out = Stratified.allocate(counts, "g", "c", k = 7)
      .orderBy("g").as[(String, Long, Long)].collect().toList
    assert(out == List(("a", 5L, 4L), ("b", 3L, 2L), ("c", 2L, 1L)))
  }

  test("allocation remainder tie breaks on the stratum key") {
    // {a:1, b:1, c:2}, k=3, N=4: bases 0/0/1, remainders 3/3/2 ->
    // two +1s; a and b tie at rem=3, both get one (c stays at 1).
    val counts = Seq(("a", 1L), ("b", 1L), ("c", 2L)).toDF("g", "c")
    val out = Stratified.allocate(counts, "g", "c", k = 3)
      .orderBy("g").as[(String, Long, Long)].collect().toList
    assert(out.map(r => r._1 -> r._3) ==
      List("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("k = N allocates every stratum its full count") {
    val counts = Seq(("a", 5L), ("b", 3L)).toDF("g", "c")
    val out = Stratified.allocate(counts, "g", "c", k = 8)
      .orderBy("g").as[(String, Long, Long)].collect().toList
    assert(out.map(_._3) == List(5L, 3L))
  }

  test("sample draws exactly the allocation per stratum, deterministically") {
    val df = (1 to 50).map(i => (if (i % 5 == 0) "x" else "y", i.toLong))
      .toDF("g", "id")
    // strata {x:10, y:40}, k=10 -> exact shares 2/8, no remainder
    val s1 = Stratified.sample(df, "g", "id", k = 10, seed = 3)
    val got = s1.groupBy("g").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 2L, "y" -> 8L))
    // rn is gapless 1..alloc within each stratum
    val rns = s1.as[(String, Long, Long)].collect().toList
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rns("x") == List(1L, 2L) && rns("y") == (1L to 8L).toList)
    // a second run replays the identical sample (pure f(data, seed))
    val s2 = Stratified.sample(df, "g", "id", k = 10, seed = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(s2 == s1.as[(String, Long, Long)].collect().toSet)
    // a different seed draws a different set (overwhelmingly)
    val s3 = Stratified.sample(df, "g", "id", k = 10, seed = 4)
      .as[(String, Long, Long)].collect().toSet
    assert(s3 != s2)
  }
}
