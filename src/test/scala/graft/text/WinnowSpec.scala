package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = "/root/testdata/sf0.001/documents.parquet"

  test("kernel fingerprints equal the expression form on real documents") {
    val docs = spark.read.parquet(fixture).select($"doc_id", $"text")
    val both = docs.select(
      Winnow.fingerprints($"text").as("expr"),
      Winnow.fingerprintsFast($"text").as("kern"))
    assert(both.filter(not($"expr" <=> $"kern")).count() == 0)
    // and the fixture actually exercises non-empty fingerprint sets
    assert(both.filter(size($"kern") > 0).count() > 0)
  }

  test("winnowing guarantee: shared passage of >= k+w-1 chars shares a fingerprint") {
    val t = Winnow.guaranteeThreshold(8, 4) // 11 normalized chars
    // two otherwise-unrelated docs embedding the same 14-char passage
    val docs = Seq(
      (1L, "xqzkv wmtrp shared passage here jfyhb nlcde"),
      (2L, "aaaaa bbbbb ccccc shared passage here ddddd"),
      (3L, "totally unrelated content with no common run")
    ).toDF("doc_id", "text")
    val fps = docs.select($"doc_id",
      Winnow.fingerprintsFast($"text").as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert("sharedpassagehere".length >= t)
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "docs sharing a >= t passage must share a fingerprint")
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty)
  }

  test("identical docs yield identical sets; short/null docs yield empty") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "tiny doc!"), // 7 normalized chars < k
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val fps = docs.select($"doc_id",
      Winnow.fingerprintsFast($"text").as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
    assert(fps(3L).isEmpty && fps(4L).isEmpty)
    // normalization: punctuation/case/whitespace do not perturb the set
    val perturbed = Seq((9L, "The QUICK, brown-fox; jumps over the lazy dog."))
      .toDF("doc_id", "text")
      .select(Winnow.fingerprintsFast($"text")).as[Seq[Long]].head()
    assert(perturbed == fps(1L))
  }

  test("sharedFingerprintPairs finds exact copies and honors the df cap") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten eleven"),
      (4L, "unrelated words entirely on their own distinct track here")
    ).toDF("doc_id", "text")
    val pairs = Winnow.sharedFingerprintPairs(base, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val fullSet = base.filter($"doc_id" === 1L)
      .select(size(Winnow.fingerprintsFast($"text")))
      .as[Int].head()
    assert(pairs.contains((1L, 2L, fullSet.toLong)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L))

    // df cap: fingerprints hot across > maxDf docs are pruned. Pin
    // the operator against a driver-side recomputation of the same
    // semantics (fingerprint sets → df filter → pair counts) on 5
    // docs that all share one boilerplate passage.
    val hot = (1L to 5L).map(i =>
      (i, s"unique${i}padding${i}morepad${i} common boilerplate line"))
      .toDF("doc_id", "text")
    val sets = hot.select($"doc_id",
      Winnow.fingerprintsFast($"text").as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size)
    val kept = sets.view.mapValues(_.filter(df(_) <= 4).toSet).toMap
    val expected = (for {
      a <- kept.keys; b <- kept.keys if a < b
      n = kept(a).intersect(kept(b)).size if n >= 1
    } yield (a, b, n.toLong)).toSet
    val got = Winnow.sharedFingerprintPairs(hot, "doc_id", "text",
      minShared = 1, maxDf = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    // the passage's interior fingerprints (df = 5) must be gone:
    // no pair can share anything close to the full passage set
    assert(got.forall(_._3 <= 3))
  }

  test("spanStats catches re-tokenized copies that token windows miss") {
    // a doc and its punctuation-perturbed copy: every token differs
    // (", " appended), so token-window span dedup sees nothing, but
    // the normalized byte stream is identical
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again with plenty of text to fingerprint reliably here"
    val docs = Seq(
      (1L, base),
      (2L, base.replace(" ", ", ")),
      (3L, "completely unrelated content about something else entirely " +
        "with its own distinct wording throughout the passage")
    ).toDF("doc_id", "text")
    // token windows (n=4 tokens, generous): the perturbed copy is
    // invisible — no doc shares any 4-token window
    val tokenSpans = graft.dedup.Dedup.duplicateSpans(
      docs, "doc_id", "text", n = 4).collect()
    assert(tokenSpans.isEmpty, s"token windows should miss: " +
      tokenSpans.mkString(","))
    // winnowed byte fingerprints: both copies fully flagged,
    // the unrelated doc untouched
    val got = Winnow.spanStats(docs, "doc_id", "text")
      .select($"doc_id", $"dup_ratio").as[(Long, Double)]
      .collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 1.0))
  }
}
