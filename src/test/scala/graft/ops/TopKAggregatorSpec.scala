package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("keeps k best with score-desc label-asc tiebreak") {
    val topk = udaf(new TopKAggregator(2))
    val out = Seq(
      ("g1", "a", 1.0), ("g1", "b", 3.0), ("g1", "c", 2.0),
      ("g2", "x", 5.0), ("g2", "y", 5.0), ("g2", "z", 5.0)
    ).toDF("g", "label", "score")
      .groupBy($"g").agg(topk($"label", $"score").as("top"))
      .select($"g", $"top").as[(String, Seq[Scored])].collect().toMap
    assert(out("g1") == Seq(Scored("b", 3.0), Scored("c", 2.0)))
    assert(out("g2") == Seq(Scored("x", 5.0), Scored("y", 5.0))) // ties: label asc
  }

  test("buffer stays bounded under merge (partition-independent)") {
    val topk = udaf(new TopKAggregator(3))
    val rows = (1 to 1000).map(i => ("g", s"l$i", i.toDouble))
    val df = rows.toDF("g", "label", "score").repartition(13)
    val out = df.groupBy($"g").agg(topk($"label", $"score").as("top"))
      .select($"top").as[Seq[Scored]].head()
    assert(out == Seq(Scored("l1000", 1000.0), Scored("l999", 999.0),
      Scored("l998", 998.0)))
  }

  test("aggregator agrees with the window row_number form") {
    val topk = udaf(new TopKAggregator(2))
    val df = Seq(
      ("a", "p", 2.0), ("a", "q", 7.0), ("a", "r", 4.0),
      ("b", "s", 1.0)).toDF("g", "label", "score")
    val viaAgg = df.groupBy($"g").agg(topk($"label", $"score").as("top"))
      .select($"g", explode($"top").as("e"))
      .select($"g", $"e.label", $"e.score")
      .as[(String, String, Double)].collect().toSet
    val viaWindow = Relational.topKPerGroup(df, Seq(col("g")),
      Seq(col("score").desc, col("label")), 2)
      .as[(String, String, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
