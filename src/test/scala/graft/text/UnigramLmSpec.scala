package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("segmentWord: Viterbi total equals brute-force max over all segmentations") {
    val scores = Map[String, Long]("a" -> -300L, "b" -> -500L,
      "ab" -> -600L, "ba" -> -450L, "aba" -> -1100L, "bb" -> -800L)
    def brute(w: String): Long = {
      if (w.isEmpty) 0L
      else (1 to math.min(UnigramLm.MaxPieceLen, w.length)).flatMap {
        l => scores.get(w.take(l)).map(_ + brute(w.drop(l)))
      }.max
    }
    for (w <- Seq("a", "ab", "ba", "abab", "ababa", "bbbb",
        "abba", "aabbaabb")) {
      val (seg, n, s) = UnigramLm.segmentWord(w, scores)
      assert(s == brute(w), s"word $w")
      // the reported pieces reassemble the word and re-score to s
      val pieces = seg.split('|').toSeq
      assert(pieces.mkString == w)
      assert(pieces.size == n)
      assert(pieces.map(scores).sum == s)
    }
  }

  test("segmentWord: exact score tie goes to the longer last piece") {
    // [aa] = -20 ties [a,a] = -20 → the l=2 candidate wins
    val scores = Map[String, Long]("a" -> -10L, "aa" -> -20L)
    val (seg, n, s) = UnigramLm.segmentWord("aa", scores)
    assert(seg == "aa" && n == 1 && s == -20L)
    // and hierarchically: "aaa" best = -30 via [aa,a]/[a,aa]/[a,a,a];
    // the tie at the FINAL position resolves to the longer last
    // piece (l DESC), giving [a,aa] — the same pick the oracle's
    // level-3 row_number makes
    val (seg3, _, s3) = UnigramLm.segmentWord("aaa", scores)
    assert(s3 == -30L && seg3 == "a|aa")
  }

  test("vocab: single chars always present, scores are negative log-probs") {
    val docs = Seq("hello world", "hello there world")
      .toDF("text")
    val v = UnigramLm.vocab(docs, "text", topV = 4).collect()
    val pieces = v.map(_.getString(0)).toSet
    for (c <- "helowrdt".map(_.toString)) assert(pieces.contains(c))
    assert(v.forall(_.getLong(2) < 0L))
    // vocab bounded: singles + at most topV multis
    assert(v.count(_.getString(0).length >= 2) <= 4)
  }

  test("segmentWords matches the kernel word-by-word") {
    val docs = Seq("spark spark scan scan scan join")
      .toDF("text")
    val voc = UnigramLm.vocab(docs, "text")
    val scoreMap = voc.select($"piece", $"score_e6")
      .as[(String, Long)].collect().toMap
    val words = UnigramLm.wordCounts(docs, "text")
    val out = UnigramLm.segmentWords(words, voc)
      .select($"w", $"seg", $"n_pieces", $"score_e6")
      .as[(String, String, Long, Long)].collect()
    assert(out.nonEmpty)
    for ((w, seg, n, s) <- out) {
      val (eSeg, eN, eS) = UnigramLm.segmentWord(w, scoreMap)
      assert(seg == eSeg && n == eN.toLong && s == eS, s"word $w")
    }
  }
}
