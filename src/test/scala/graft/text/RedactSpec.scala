package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails and phone groups, counts match") {
    val df = Seq(
      "mail a.b_c9@ex.org and x@y.io tel 555-0012 end",
      "no pii here",
      "digits 12-3456 1234-567 not phones, 123-4567 is").toDF("t")
    val out = df.select(
      Redact.redactPii(col("t")).as("r"),
      Redact.emailCount(col("t")).as("e"),
      Redact.phoneCount(col("t")).as("p"))
      .as[(String, Int, Int)].collect()
    assert(out(0) === (("mail <EMAIL> and <EMAIL> tel <PHONE> end", 2, 1)))
    assert(out(1) === (("no pii here", 0, 0)))
    assert(out(2)._2 === 0)
    assert(out(2)._3 === 1)
    assert(out(2)._1.contains("<PHONE> is"))
  }

  test("tokenChunks windows with overlap, short tail kept") {
    val df = Seq("a b c d e").toDF("t")
    val out = df.select(explode(
        TextFunctions.tokenChunks(split(col("t"), " "), 3, 2)).as("c"))
      .select(col("c.chunk_idx"), array_join(col("c.chunk"), " "))
      .as[(Int, String)].collect().toSeq
    assert(out === Seq((0, "a b c"), (1, "c d e"), (2, "e")))
  }
}
