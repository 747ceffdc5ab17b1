package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HllSpec extends SparkSpec {
  import spark.implicits._

  /** JVM replay of the register math — the same md5/bit pipeline the
    * column expressions encode, computed independently.
    */
  private def bruteRegisters(keys: Seq[String]): Map[Int, Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.foldLeft(Map.empty[Int, Int]) { (acc, k) =>
      md.reset()
      val hex = md.digest(k.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h >>> Hll.K).toInt
      val w = h & ((1L << Hll.K) - 1)
      val rho =
        if (w == 0L) Hll.K + 1
        else Hll.K + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      acc.updated(bucket, math.max(acc.getOrElse(bucket, 0), rho))
    }
  }

  test("registers match an independent JVM replay of the md5/bit pipeline") {
    val keys = (1 to 500).map(i => s"user_$i")
    val regs = Hll.registers(
      keys.toDF("k").withColumn("g", lit("a")), "k", Seq("g"))
      .select($"bucket", $"r").as[(Int, Int)].collect().toMap
    assert(regs == bruteRegisters(keys))
  }

  test("mergeability: max-merge of register tables == registers of the union") {
    val a = (1 to 400).map(i => ("g", s"k$i")).toDF("g", "k")
    val b = (300 to 700).map(i => ("g", s"k$i")).toDF("g", "k")
    val merged = Hll.merge(
      Hll.registers(a, "k", Seq("g")),
      Hll.registers(b, "k", Seq("g")), Seq("g"))
      .as[(String, Int, Int)].collect().toSet
    val union = Hll.registers(a.unionByName(b), "k", Seq("g"))
      .as[(String, Int, Int)].collect().toSet
    assert(merged == union)
  }

  test("estimate lands inside the m=64 error band on known cardinalities") {
    for (n <- Seq(200, 1000, 5000)) {
      val df = (1 to n).map(i => ("g", s"key_${i}_x")).toDF("g", "k")
      val (est, _) = Hll.estimate(Hll.registers(df, "k", Seq("g")), Seq("g"))
        .select($"est", $"zero_regs").as[(Long, Long)].head()
      // m=64 → SE ≈ 1.04/sqrt(64) = 13%; allow 3.5σ plus the raw
      // estimator's known low-range bias margin
      assert(math.abs(est - n) <= n * 0.5, s"n=$n est=$est")
    }
  }

  test("duplicates do not move the sketch: registers(keys) == registers(keys ++ keys)") {
    val once = (1 to 300).map(i => ("g", s"k$i")).toDF("g", "k")
    val twice = once.unionByName(once)
    assert(
      Hll.registers(once, "k", Seq("g")).as[(String, Int, Int)]
        .collect().toSet ==
        Hll.registers(twice, "k", Seq("g")).as[(String, Int, Int)]
          .collect().toSet)
  }
}
