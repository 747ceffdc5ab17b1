package graft.topic

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LdaEmSpec extends SparkSpec {
  import spark.implicits._

  private def toks = graft.text.TextFunctions.tokens(col("text"))

  private def corpus = Seq(
    (1L, "apple banana apple cherry apple"),
    (2L, "banana cherry banana apple"),
    (3L, "dog cat dog bird dog dog"),
    (4L, "cat bird cat dog"),
    (5L, "apple dog banana cat")
  ).toDF("doc_id", "text").select(col("doc_id"), toks.as("toks"))

  test("fit is deterministic: two runs produce identical assignments") {
    val (v1, a1) = LdaEm.fit(corpus, "doc_id", "toks", k = 2,
      vocabSize = 10, iters = 2)
    val (v2, a2) = LdaEm.fit(corpus, "doc_id", "toks", k = 2,
      vocabSize = 10, iters = 2)
    assert(a1.as[(Long, Long, Long, Long)].collect().toSet ==
      a2.as[(Long, Long, Long, Long)].collect().toSet)
    assert(v1.as[(String, Long)].collect().toSet ==
      v2.as[(String, Long)].collect().toSet)
    Seq(v1, a1, v2, a2).foreach(_.unpersist(blocking = false))
  }

  test("fit conserves counts and assigns exactly one topic per (doc, word)") {
    val (v, a) = LdaEm.fit(corpus, "doc_id", "toks", k = 2,
      vocabSize = 10, iters = 3)
    val rows = a.as[(Long, Long, Long, Long)].collect()
    // every (doc, word) appears once — hard assignment
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    // token counts conserved through 3 E/M rounds (6 distinct words,
    // 23 tokens total in the fixture)
    assert(rows.map(_._3).sum == 23L)
    // topics stay in range
    assert(rows.forall(r => r._4 >= 0 && r._4 < 2))
    // vocab indices are 0..5 by (freq desc, token asc)
    val voc = v.as[(String, Long)].collect().toMap
    assert(voc.values.toSet == (0L to 5L).toSet)
    Seq(v, a).foreach(_.unpersist(blocking = false))
  }

  test("docTopics: one row per doc; ties break to the smallest topic") {
    val (v, a) = LdaEm.fit(corpus, "doc_id", "toks", k = 2,
      vocabSize = 10, iters = 2)
    val dt = LdaEm.docTopics(a, "doc_id")
      .as[(Long, Long)].collect().toList
    assert(dt.map(_._1) == List(1L, 2L, 3L, 4L, 5L))
    // cross-check the argmax rule against the raw assignments
    val ndk = a.groupBy(col("__d"), col("__z"))
      .agg(sum(col("__cnt")).as("n"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
    dt.foreach { case (d, z) =>
      val best = ndk(d).map(r => (-r._3, r._2)).min._2
      assert(z == best, s"doc $d")
    }
    Seq(v, a).foreach(_.unpersist(blocking = false))
  }

  test("objective replays exactly from the raw assignments") {
    val (v, a) = LdaEm.fit(corpus, "doc_id", "toks", k = 2,
      vocabSize = 10, iters = 2)
    val rows = a.as[(Long, Long, Long, Long)].collect() // d, w, cnt, z
    val ndk = rows.groupBy(r => (r._1, r._4)).map { case (g, rs) => g -> rs.map(_._3).sum }
    val nwk = rows.groupBy(r => (r._2, r._4)).map { case (g, rs) => g -> rs.map(_._3).sum }
    val nk = rows.groupBy(_._4).map { case (z, rs) => z -> rs.map(_._3).sum }
    val vSize = 10
    val expected = rows.groupBy(_._4).map { case (z, rs) =>
      val tokSum = rs.map { r =>
        val s = BigInt(100 * ndk((r._1, z)) + 50) *
          BigInt(100 * nwk((r._2, z)) + 10) * BigInt(1000000) /
          BigInt(100 * nk(z) + vSize * 10)
        BigInt(r._3) * s
      }.sum
      (z, rs.map(_._2).distinct.length.toLong, rs.map(_._3).sum,
        (tokSum / 1000000).toLong)
    }.toSet
    val got = LdaEm.objective(a, vocabSize = vSize)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // one row per topic actually assigned, positive objective
    assert(got.map(_._1) == rows.map(_._4).toSet)
    assert(got.forall(_._4 > 0))
    Seq(v, a).foreach(_.unpersist(blocking = false))
  }

  test("topicTerms ranks by assigned count desc, vocab index asc") {
    val (v, a) = LdaEm.fit(corpus, "doc_id", "toks", k = 2,
      vocabSize = 10, iters = 2)
    val tt = LdaEm.topicTerms(v, a, termsPerTopic = 3)
      .as[(Long, Long, String, Long)].collect().toList
    // ranks restart per topic and counts never increase within one
    tt.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length).toList)
      assert(sorted.sliding(2).forall {
        case Seq(x, y) => x._4 >= y._4
        case _ => true
      })
    }
    Seq(v, a).foreach(_.unpersist(blocking = false))
  }
}
