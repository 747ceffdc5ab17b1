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

  test("containmentJoin is EXACT: equals brute force at the threshold") {
    val docs = corpus.toDF("doc_id", "text")
    // probes: the first 4 tokens of every 5th doc — short sets a
    // symmetric Jaccard join would drown inside the longer docs
    val probeRows = corpus.filter(_._1 % 5 == 2)
      .map { case (i, t) => (i + 5000L, t.split(" ").take(4).mkString(" ")) }
    val probes = probeRows.toDF("doc_id", "text")
    val got = SetJoin.containmentJoin(probes, docs,
        "doc_id", tokenSet, "doc_id", tokenSet, 3, 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val cSets = corpus.map { case (i, t) => i -> t.split(" ").toSet }
    val qSets = probeRows.map { case (i, t) => i -> t.split(" ").toSet }
    val expected = (for {
      (iq, sq) <- qSets; (ic, sc) <- cSets
      inter = (sq & sc).size.toLong
      lq = sq.size.toLong
      if inter * 4 >= lq * 3
    } yield (iq, ic, inter, lq, inter * 1000000L / lq)).toSet
    assert(got == expected)
    // every probe is contained in its own source doc at 1.0
    assert(qSets.forall { case (iq, _) =>
      expected.exists(p => p._1 == iq && p._2 == iq - 5000L &&
        p._5 == 1000000L) })
    // asymmetry teeth: at least one found pair FAILS the same-
    // threshold Jaccard test (short probe, long doc)
    assert(expected.exists { case (iq, ic, inter, lq, _) =>
      val uni = lq + cSets.toMap.apply(ic).size - inter
      inter * 4 < uni * 3 })
  }

  test("identical documents always pair at jaccard exactly 1") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val got = SetJoin.jaccardJoin(docs, "doc_id", tokenSet, 3, 5)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == List((1L, 2L, 3L, 3L, 1000000L)))
  }
}
