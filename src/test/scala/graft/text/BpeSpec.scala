package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordCounts aggregates corpus frequencies, drops 1-char words") {
    val docs = Seq((1L, "ab ab c abc"), (2L, "ab x yz")).toDF("id", "text")
    val wc = Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(wc == Map("ab" -> 3L, "abc" -> 1L, "yz" -> 1L))
  }

  test("pairCounts weights each adjacent pair by word frequency") {
    val words = Seq(("ab", 3L), ("abc", 1L), ("yz", 1L)).toDF("w", "freq")
    val pc = Bpe.pairCounts(words).as[(String, Long)].collect().toMap
    // "ab" from 'ab'×3 and 'abc'×1; "bc" from 'abc'×1; "yz" from 'yz'×1
    assert(pc == Map("ab" -> 4L, "bc" -> 1L, "yz" -> 1L))
  }

  test("pair counting over distinct words equals counting over raw tokens") {
    val docs = Seq((1L, "spark spark scale merge"), (2L, "spark merge"))
      .toDF("id", "text")
    val viaVocab = Bpe.pairCounts(Bpe.wordCounts(docs, "text"))
      .as[(String, Long)].collect().toMap
    // brute force: pairs from every token occurrence
    val brute = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" "))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    assert(viaVocab == brute)
  }

  test("learnMerges survives a word collapsing to one symbol and " +
      "stops when no pairs remain") {
    // 'in' merges first (freq 3) and becomes a SINGLE symbol — the
    // next round's pair generation must skip it (sequence(1, 0)
    // would descend and index element 0), then 'a b' merges, then
    // the loop finds no pairs at all and stops early.
    val docs = Seq((1L, "in in ab"), (2L, "in ab")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", k = 4)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    assert(merges == Seq((1, "i n", "in"), (2, "a b", "ab")))
  }

  // rich synthetic corpus: enough vocab diversity to sustain 64+
  // genuine merge rounds (pseudo-random words over a 12-letter
  // alphabet, Zipf-ish frequencies via repetition)
  private def richCorpus = {
    val rnd = new scala.util.Random(5)
    val alphabet = "abcdefghijkl"
    val words = (1 to 400).map { _ =>
      (3 + rnd.nextInt(8)).to(1, -1)
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val docs = (1 to 120).map { id =>
      val n = 5 + rnd.nextInt(20)
      (id.toLong,
        Seq.fill(n)(words(math.min(rnd.nextInt(400), rnd.nextInt(400))))
          .mkString(" "))
    }
    docs.toDF("id", "text")
  }

  test("learnMerges at k=64: checkpointed run equals the un-checkpointed " +
      "run, and its first 5 merges equal the k=5 artifact") {
    val docs = richCorpus
    // tight checkpoint cadence so the truncation path runs 8 times
    val k64 = Bpe.learnMerges(docs, "text", k = 64, checkpointEvery = 8)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    assert(k64.size == 64, s"corpus exhausted at ${k64.size} merges")
    // lineage truncation must not change WHAT is learned
    val k64NoCp = Bpe.learnMerges(docs, "text", k = 64,
        checkpointEvery = Int.MaxValue)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    assert(k64 == k64NoCp)
    // greedy argmax is prefix-stable: a longer run extends, never
    // rewrites, a shorter one (the q151 k=5 artifact contract)
    val k5 = Bpe.learnMerges(docs, "text", k = 5)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    assert(k64.take(5) == k5)
  }

  test("learnMerges drops supplementary-plane words both engines " +
      "cannot segment identically") {
    // U+1F600 splits into two UTF-16 lone surrogates under Spark's
    // split(w, "") but one codepoint under SQL string_split — such
    // words are excluded on both sides rather than silently diverging
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"ab$emoji ab ab cd cd")).toDF("id", "text")
    val merges = Bpe.learnMerges(docs, "text", k = 2)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    // only 'ab' (freq 2) and 'cd' (freq 2) participate; the emoji
    // word is gone entirely
    assert(merges == Seq((1, "a b", "ab"), (2, "c d", "cd")))
  }
}
