package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1000 left rows, 80% on hot key 7; right is a 10-key dimension
  private def left = (0 until 1000)
    .map(i => (i.toLong, if (i % 5 != 0) 7L else (i % 10).toLong, i * 1.5))
    .toDF("row_id", "k", "v")
  private def right = (0 until 10)
    .map(i => (i.toLong, s"label_$i")).toDF("k", "lab")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"row_id", $"k", $"v", $"lab")
      .as[(Long, Long, Double, String)].collect().sortBy(_._1).toSeq

  test("salted inner join equals the plain join row-for-row") {
    val plain = left.join(right, Seq("k"))
    val salted = SaltedJoin.equiJoin(left, right, "k", $"row_id", nSalts = 8)
    assert(canon(salted) == canon(plain))
  }

  test("salted left join keeps unmatched left rows exactly once") {
    // key 99 matches nothing
    val l2 = left.unionByName(Seq((5000L, 99L, 0.0)).toDF("row_id", "k", "v"))
    val plain = l2.join(right, Seq("k"), "left")
    val salted = SaltedJoin
      .equiJoin(l2, right, "k", $"row_id", nSalts = 8, joinType = "left")
    val p = plain.select($"row_id", $"k", $"v", $"lab")
      .as[(Long, Long, Double, Option[String])].collect().sortBy(_._1).toSeq
    val s = salted.select($"row_id", $"k", $"v", $"lab")
      .as[(Long, Long, Double, Option[String])].collect().sortBy(_._1).toSeq
    assert(s == p)
    assert(s.count(_._1 == 5000L) == 1)
  }

  test("the hot key's rows actually spread across all salts") {
    val spread = left.filter($"k" === 7L)
      .select(SaltedJoin.saltOf($"row_id", 8).as("s"))
      .distinct().as[Int].collect().toSet
    assert(spread == (0 until 8).toSet, s"salts used: $spread")
  }

  test("the join key includes the salt (the plan joins on (k, __salt))") {
    val plan = SaltedJoin.equiJoin(left, right, "k", $"row_id", nSalts = 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan.take(1500))
  }

  test("right/full outer joins are rejected loudly") {
    intercept[IllegalArgumentException] {
      SaltedJoin.equiJoin(left, right, "k", $"row_id", nSalts = 8,
        joinType = "right")
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.equiJoin(left, right, "k", $"row_id", nSalts = 0)
    }
  }
}
