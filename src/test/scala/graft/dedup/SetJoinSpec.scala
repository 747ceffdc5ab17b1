package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tokenSet = array_distinct(split(col("text"), " "))

  /** Deterministic word-salad corpus with planted near-duplicates. */
  private def corpus: Seq[(Long, String)] = {
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "the", "of", "and")
    val base = (0L until 40L).map { i =>
      val words = (0 until 8).map(j => pool(((i * 7 + j * 3 + j * j) % 13).toInt))
      (i, words.distinct.mkString(" "))
    }
    // variants: one token appended → high Jaccard with the source
    val vars = base.filter(_._1 % 5 == 0)
      .map { case (i, t) => (i + 1000L, t + s" extra${i % 3}") }
    base ++ vars
  }

  test("jaccardJoin is EXACT: equals brute force at the threshold") {
    val docs = corpus.toDF("doc_id", "text")
    val got = SetJoin.jaccardJoin(docs, "doc_id", tokenSet, 3, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val sets = corpus.map { case (i, t) => i -> t.split(" ").toSet }
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = sa.size + sb.size - inter
      if inter * 5 >= uni * 3
    } yield (ia, ib, inter, uni, inter * 1000000L / uni)).toSet
    assert(got == expected)
    // the planted variants must all be found (completeness teeth:
    // an LSH pass may miss them, this join may not)
    val planted = corpus.collect { case (i, _) if i >= 1000L => i }
    assert(planted.forall(v => expected.exists(p => p._2 == v)))
    assert(expected.nonEmpty)
  }

  test("identical documents always pair at jaccard exactly 1") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val got = SetJoin.jaccardJoin(docs, "doc_id", tokenSet, 3, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == List((1L, 2L, 3L, 3L, 1000000L)))
  }
}
