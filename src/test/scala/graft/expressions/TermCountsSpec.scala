package graft.expressions

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TermCountsSpec extends SparkSpec {
  import spark.implicits._

  private def tc(c: org.apache.spark.sql.Column) =
    GraftShim.column(TermCounts(GraftShim.expression(c)))

  private def docs = Seq(
    (1L, Seq("a", "b", "a", "c", "a")),
    (2L, Seq("b", "b")),
    (3L, Seq.empty[String]),
    (4L, null: Seq[String])
  ).toDF("doc_id", "toks")

  test("generates one (term, tf) row per distinct token") {
    val out = docs.select($"doc_id", tc($"toks"))
      .as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "a", 3), (1L, "b", 1), (1L, "c", 1),
      (2L, "b", 2)))
    // empty and null arrays generate no rows (explode semantics)
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
  }

  test("agrees with the explode + groupBy formulation") {
    val corpus = graft.io.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" < 50)
      .select($"doc_id", graft.text.TextFunctions.tokens($"text").as("toks"))
    val gen = corpus.select($"doc_id", tc($"toks"))
      .as[(Long, String, Int)].collect().toSet
    val agg = corpus
      .select($"doc_id", explode($"toks").as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).cast("int").as("tf"))
      .as[(Long, String, Int)].collect().toSet
    assert(gen == agg)
    assert(gen.nonEmpty)
  }
}
