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

  test("redactAll: NANP before short-phone, IPs, chain order pinned") {
    val df = Seq(
      "call 555-010-1234 or 555-0012 from 10.0.3.77 end",
      "a@b.io at 192.168.1.1",
      // a NANP number must become ONE <PHONE>, not a half-eaten
      // "555-<PHONE>" from the short ddd-dddd pattern
      "just 800-555-0199").toDF("t")
    val out = df.select(
      Redact.redactAll(col("t")).as("r"),
      Redact.nanpCount(col("t")).as("np"),
      Redact.ipCount(col("t")).as("ip"))
      .as[(String, Int, Int)].collect()
    assert(out(0) === (("call <PHONE> or <PHONE> from <IP> end", 1, 1)))
    assert(out(1) === (("<EMAIL> at <IP>", 0, 1)))
    assert(out(2) === (("just <PHONE>", 1, 0)))
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
