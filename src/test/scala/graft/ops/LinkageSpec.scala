package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    (1L, "ann", "north", 100L),
    (2L, "ann", "north", 103L),   // same block, same name, close bal
    (3L, "bob", "north", 100L),   // same block, different name
    (4L, "ann", "south", 100L))   // different block: never paired
    .toDF("id", "name", "region", "bal")

  test("blockPairs: only within-block pairs, ids ordered, fields suffixed") {
    val p = Linkage.blockPairs(recs, "id", Seq("region"))
      .select($"id_a", $"id_b", $"name_a", $"name_b")
      .as[(Long, Long, String, String)].collect().toSet
    assert(p == Set((1L, 2L, "ann", "ann"), (1L, 3L, "ann", "bob"),
      (2L, 3L, "ann", "bob")))
  }

  test("fsClassify: integer score sum, thresholds, non-match dropped") {
    val pairs = Linkage.blockPairs(recs, "id", Seq("region"))
    val out = Linkage.fsClassify(pairs, Seq(
        ($"name_a" === $"name_b", 30, -20),
        (abs($"bal_a" - $"bal_b") <= lit(5L), 15, -10)),
      matchMin = 40, possibleMin = 0)
      .select($"id_a", $"id_b", $"score", $"cls")
      .as[(Long, Long, Long, String)].collect().toSet
    // (1,2): 30+15=45 match; (1,3)/(2,3): -20+15=-5 dropped
    assert(out == Set((1L, 2L, 45L, "match")))
  }
}
