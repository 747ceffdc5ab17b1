package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over a sleepy dog"), // near dup
    (4L, "completely different text about spark engines here")
  ).toDF("doc_id", "text")

  test("exactGroups finds the duplicate pair with min-id representative") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .filter($"n_dups" > 1).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keep_id") == 1L)
    assert(groups(0).getAs[Long]("n_dups") == 2L)
  }

  test("dropExactDups keeps one representative and is idempotent") {
    val once = Dedup.dropExactDups(docs, "doc_id", "text")
    assert(once.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L))
    val twice = Dedup.dropExactDups(once, "doc_id", "text")
    assert(twice.count() == once.count())
  }

  test("identical docs have identical minhash signatures") {
    val sigs = docs.select($"doc_id",
      Dedup.minhashSignature(Dedup.shingles($"text", 3), 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    assert(sigs(1L).length == 8)
  }

  test("minhash signature agreement tracks jaccard similarity") {
    val sigs = docs.select($"doc_id",
      Dedup.minhashSignature(Dedup.shingles($"text", 3), 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    def agree(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).count { case (x, y) => x == y }
    // near dup (1,3) must agree on more components than unrelated (1,4)
    assert(agree(sigs(1L), sigs(3L)) > agree(sigs(1L), sigs(4L)))
  }

  test("minhashSignatureFast kernel matches the expression form exactly") {
    val edge = docs.unionByName(Seq(
      (5L, "one two"),           // < 3 tokens ⇒ empty shingle set
      (6L, "unicode tökens with ümlauts repeated tökens here maybe")
    ).toDF("doc_id", "text"))
    val both = edge.select($"doc_id",
      Dedup.minhashSignature(Dedup.shingles($"text", 3), 8).as("expr"),
      Dedup.minhashSignatureFast(Dedup.shingles($"text", 3), 8).as("fast"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}")
    }
  }

  test("bandKeysFast fused kernel matches the composed expression form") {
    val edge = docs.unionByName(Seq(
      (5L, "one two"),           // < 3 tokens ⇒ empty shingle set ⇒ null bands
      (6L, "unicode tökens with ümlauts repeated tökens here maybe")
    ).toDF("doc_id", "text"))
    val both = edge.select($"doc_id",
      Dedup.bandKeys(Dedup.minhashSignature(Dedup.shingles($"text", 3), 8),
        4, 2).as("expr"),
      Dedup.bandKeysFast(Dedup.shingles($"text", 3), 8, 4).as("fast"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}")
    }
  }

  test("lshCandidates surfaces exact and near dups, not unrelated docs") {
    val pairs = Dedup.lshCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccardOnCandidates computes exact jaccard") {
    val cands = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardOnCandidates(docs, cands, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) == 0.0)
  }

  test("simhash: identical text → distance 0; near dup closer than unrelated") {
    val sims = docs.select($"doc_id",
      Dedup.simhash60(graft.text.TextFunctions.tokens($"text")).as("s"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(2L)) == 0)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)))
    // 60-bit: no simhash uses the top 4 bits
    assert(sims.values.forall(s => s >= 0 && (s >> 60) == 0))
  }

  test("hammingDist column matches JVM bitCount") {
    val out = Seq((0xF0L, 0x0FL)).toDF("a", "b")
      .select(Dedup.hammingDist($"a", $"b").as("h")).as[Int].head()
    assert(out == 8)
  }

  test("multi-table near-pairs catch what a single prefix misses") {
    // y differs from x only in bits 50/55 — inside the top 15-bit
    // window, so table 0 (bits 45-59) buckets them apart while
    // table 1 (bits 30-44) still matches them
    val x = 0x0ABCDEF012345L
    val y = x ^ (1L << 50) ^ (1L << 55)
    val z = 0x00000000000FFL // unrelated in both windows, far hamming
    val sims = Seq((1L, x), (2L, y), (3L, z)).toDF("id", "sim")
    def pairs(tables: Int) =
      Dedup.simhashNearPairs(sims, "id", "sim", tables, maxHamming = 5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs(1).contains((1L, 2L))) // single table misses it
    assert(pairs(2) == Set((1L, 2L)))    // second window recovers it
  }

  test("bandedHammingPairs: total recall below `tables` (pigeonhole)") {
    // 56-bit hashes, 4 x 14-bit windows: every pair at hamming <= 3
    // MUST surface, whichever bits differ. Property-style sweep:
    // derive neighbors from a base by flipping 1..3 arbitrary bits
    // (including adversarial all-in-one-window placements).
    val base = 0x00ABCDEF9876543L & ((1L << 56) - 1)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 30).map { id =>
      val flips = rnd.nextInt(3) + 1
      var h = base
      (1 to flips).foreach(_ => h ^= 1L << rnd.nextInt(56))
      (id.toLong, h)
    } :+ (99L, base)
    val df = rows.toDF("id", "hash")
    val got = Dedup.bandedHammingPairs(df, "id", "hash",
      totalBits = 56, width = 14, tables = 4, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force truth
    val want = (for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("ngramOverlapAcross grades partial containment exactly") {
    // bench question of 6 tokens; train doc 1 quotes it inside a
    // larger page; train doc 2 is clean. n=4-token windows.
    val bench = Seq((100L, "what is the capital of france"))
      .toDF("id", "text")
    val train = Seq(
      (1L, "intro words here what is the capital of france outro text"),
      (2L, "a completely clean document with no overlap at all")
    ).toDF("id", "text")
    val rows = Dedup.ngramOverlapAcross(train, bench, "id", "text", n = 4)
      .as[(Long, Long, Long, Double)].collect()
    // doc 1: 11 tokens → 8 windows; the quoted 6 tokens yield 3
    // bench windows, all hit → 3/8; clean doc 2 emits no row
    assert(rows.map(_._1).toSeq == Seq(1L))
    val (_, nw, nh, frac) = rows.head
    assert((nw, nh) == ((8L, 3L)))
    assert(math.abs(frac - 0.375) < 1e-9)
  }

  test("simhashNearPairs delegation preserves the 60-bit windows") {
    // same fixture as the multi-table test: behavior must be
    // unchanged after the bandedHammingPairs refactor
    val x = 0x0ABCDEF012345L
    val y = x ^ (1L << 50) ^ (1L << 55)
    val sims = Seq((1L, x), (2L, y)).toDF("id", "sim")
    val direct = Dedup.bandedHammingPairs(sims, "id", "sim",
      totalBits = 60, width = 15, tables = 2, maxHamming = 5)
      .collect().toSeq
    val legacy = Dedup.simhashNearPairs(sims, "id", "sim", tables = 2,
      maxHamming = 5).collect().toSeq
    assert(direct == legacy)
  }

  test("simhash native expression equals the UDF reference kernel") {
    val toks = graft.text.TextFunctions.tokens($"text")
    val both = docs.select(
      Dedup.simhash60(toks).as("expr"),
      Dedup.simhash60Udf(toks).as("udf"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (e, u) => assert(e == u) }
    // null array → 0L, matching the UDF's guard
    val nullCase = Seq(Tuple1(null: Seq[String])).toDF("t")
      .select(Dedup.simhash60($"t").as("s")).as[Long].head()
    assert(nullCase == 0L)
  }

  test("stripHotParagraphs removes corpus-wide boilerplate in place") {
    val corpus = Seq(
      (1L, "unique text one\nCOOKIE BANNER\nmore body"),
      (2L, "second doc body\nCOOKIE BANNER"),
      (3L, "COOKIE BANNER\nthird body text"),
      (4L, "no banner here at all"),
      // same paragraph twice in ONE doc: repeats within a doc do not
      // make it hot (distinct-doc count, not occurrence count)
      (5L, "repeated para\nrepeated para\nown body")
    ).toDF("doc_id", "text")
    val out = Dedup.stripHotParagraphs(corpus, "doc_id", "text", minDocs = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // banner (in 3 distinct docs) stripped, order of survivors kept
    assert(out(0) == ((1L, 3L, 1L, "unique text one\nmore body")))
    assert(out(1) == ((2L, 2L, 1L, "second doc body")))
    assert(out(2) == ((3L, 2L, 1L, "third body text")))
    assert(out(3) == ((4L, 1L, 0L, "no banner here at all")))
    // within-doc repeat survives: only 1 distinct doc carries it
    assert(out(4) == ((5L, 3L, 0L, "repeated para\nrepeated para\nown body")))
  }

  test("stripHotParagraphs is a no-op plan-wise safe when nothing is hot") {
    val corpus = Seq((1L, "a\nb"), (2L, "c\nd")).toDF("doc_id", "text")
    val out = Dedup.stripHotParagraphs(corpus, "doc_id", "text", minDocs = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0L, "a\nb"), (2L, 2L, 0L, "c\nd")))
  }

  test("keepFirstParagraphs keeps exactly the first (id, pos) occurrence") {
    val corpus = Seq(
      (1L, "A\nB"),
      (2L, "B\nC"),   // B already seen in doc 1
      (3L, "A")       // fully deduped away
    ).toDF("doc_id", "text")
    val out = Dedup.keepFirstParagraphs(corpus, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "A\nB"),
      (2L, 2L, 1L, "C"),
      (3L, 1L, 0L, "")))
  }

  test("keepFirstParagraphs dedups repeats within one doc to the first") {
    val corpus = Seq((1L, "X\nY\nX")).toDF("doc_id", "text")
    val out = Dedup.keepFirstParagraphs(corpus, "doc_id", "text")
      .as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 3L, 2L, "X\nY")))
  }

  test("keepFirstParagraphs keeps each distinct paragraph exactly once, corpus-wide") {
    // pseudo-random corpus from a small paragraph alphabet so repeats
    // are dense; deterministic seed
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("p0", "p1", "p2", "p3", "p4", "p5")
    val corpus = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(4)
      (id, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString("\n"))
    }.toDF("doc_id", "text")
    val out = Dedup.keepFirstParagraphs(corpus, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
    val distinctParas = corpus.as[(Long, String)].collect()
      .flatMap(_._2.split("\n", -1)).toSet
    // total kept across the corpus = number of distinct paragraphs
    assert(out.map(_._3).sum == distinctParas.size)
    // and the kept texts reassemble exactly that set, no repeats
    val keptAll = out.flatMap(r =>
      if (r._4.isEmpty) Nil else r._4.split("\n", -1).toSeq)
    assert(keptAll.length == keptAll.distinct.length)
    assert(keptAll.toSet == distinctParas)
  }

  test("keepFirstParagraphs is idempotent on its own output") {
    val corpus = Seq((1L, "A\nB"), (2L, "B\nC"), (3L, "A\nC\nD"))
      .toDF("doc_id", "text")
    val once = Dedup.keepFirstParagraphs(corpus, "doc_id", "text")
      .select($"doc_id", $"clean".as("text"))
    // after one pass every surviving paragraph is globally unique,
    // so a second pass removes nothing
    val again = Dedup.keepFirstParagraphs(once, "doc_id", "text")
      .filter($"n_kept" < $"n_paras")
      .select($"doc_id").as[Long].collect().toSeq
    assert(again.isEmpty)
  }

  test("stripHotParagraphs never shuffles paragraph text, broadcasts the hot set") {
    val corpus = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val plan = Dedup.stripHotParagraphs(corpus, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    // pass 2 joins the one-row hot set by broadcast, never sort-merge
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }

  // --- lshCandidatesAcross(broadcastRight = false): the two-large-
  // corpora decontamination mode. Fixture mirrors q110's shape: a
  // small benchmark corpus plus a training corpus that contains
  // near-verbatim copies of every benchmark doc.
  private def decontamFixture = {
    val base = (0L until 40L).map { i =>
      (i, s"document number $i discusses topic ${i % 7} using a " +
        s"shared pool of filler words plus marker w${i % 11} w${i % 13}")
    }.toDF("doc_id", "text")
    val bench = base.filter($"doc_id" < 10)
    val cont = bench.select(($"doc_id" + 1000L).as("doc_id"),
      concat($"text", lit(" zq1 zq2")).as("text"))
    (base.filter($"doc_id" >= 10).unionByName(cont), bench)
  }

  test("lshCandidatesAcross: broadcastRight=false returns exactly the broadcast-mode pairs") {
    val (train, bench) = decontamFixture
    def pairs(bc: Boolean) =
      Dedup.lshCandidatesAcross(train, bench, "doc_id", "text",
          w = 3, k = 8, bands = 4, broadcastRight = bc)
        .as[(Long, Long)].collect().sorted.toSeq
    val viaBroadcast = pairs(bc = true)
    val viaShuffle = pairs(bc = false)
    assert(viaShuffle == viaBroadcast)
    // the planted near-verbatim copies must be among the candidates —
    // an empty intersection would make the equality above vacuous
    assert(viaBroadcast.exists { case (l, r) => l == r + 1000L })
  }

  test("lshCandidatesAcross: broadcastRight=false plans a shuffle equi-join on the band key") {
    val (train, bench) = decontamFixture
    // test data is tiny, so the STATIC planner would auto-broadcast
    // under the 10 MB threshold regardless of the hint; disable the
    // size-based promotion so the plan shows what the mode flag alone
    // decides — which is the contract at two-large-corpora scale,
    // where both sides exceed any threshold. (AQE re-promoting a
    // runtime-small side back to broadcast is separately allowed and
    // documented at the call site.)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // executedPlan, not sparkPlan: exchanges are only inserted by
      // EnsureRequirements during preparation (with AQE this prints
      // the initial plan, before any runtime re-promotion)
      val shufflePlan = Dedup.lshCandidatesAcross(train, bench,
          "doc_id", "text", broadcastRight = false)
        .queryExecution.executedPlan.toString
      assert(!shufflePlan.contains("BroadcastExchange"))
      assert(shufflePlan.contains("SortMergeJoin") ||
        shufflePlan.contains("ShuffledHashJoin"))
      // the equi-join key is the band digest, not a cartesian + filter
      assert(shufflePlan.contains("band"))
      assert(!shufflePlan.contains("CartesianProduct"))
      // and the default mode still broadcasts even with the size-based
      // promotion off: the explicit hint, not statistics, carries it
      val broadcastPlan = Dedup.lshCandidatesAcross(train, bench,
          "doc_id", "text", broadcastRight = true)
        .queryExecution.executedPlan.toString
      assert(broadcastPlan.contains("BroadcastExchange"))
      assert(!broadcastPlan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("duplicateSpanExtents: overlapping and adjacent windows merge, gap > n splits") {
    // 40 shared tokens s0..s39 at the HEAD of doc 1 and doc 2 (one
    // maximal span), plus a second shared run u0..u12 (exactly n=13
    // tokens — one window) near doc 1's tail, separated by unique
    // filler wider than n.
    val shared = (0 until 40).map(i => s"s$i").mkString(" ")
    val run2 = (0 until 13).map(i => s"u$i").mkString(" ")
    val filler1 = (0 until 20).map(i => s"f$i").mkString(" ")
    val filler2 = (0 until 20).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared $filler1 $run2"),
      (2L, s"$shared $filler2"),
      (3L, s"$run2 alone tail words here padding")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanExtents(docs, "doc_id", "text", n = 13)
      .as[(Long, Long, Long, Long)].collect().toList
    // doc1: windows 1..28 all duplicated (shared head, merge into
    // [1,40]); u-run starts at token 61, its single window → [61,73]
    assert(out == List(
      (1L, 1L, 40L, 40L), (1L, 61L, 73L, 13L),
      (2L, 1L, 40L, 40L),
      (3L, 1L, 13L, 13L)))
  }

  test("duplicateSpanExtents: extents cover exactly duplicateSpans' window count") {
    // coverage-union replay: per doc, Σ span_tokens must equal the
    // size of { p..p+n-1 : window p duplicated } — brute-forced here
    val docs = Seq(
      (1L, (0 until 30).map(i => s"a$i").mkString(" ") + " " +
        (0 until 15).map(i => s"x$i").mkString(" ") + " " +
        (0 until 30).map(i => s"a$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"a$i").mkString(" "))
    ).toDF("doc_id", "text")
    val n = 13
    val spans = Dedup.duplicateSpanExtents(docs, "doc_id", "text", n)
      .as[(Long, Long, Long, Long)].collect().toList
    // brute force: hash windows, find cross-doc dups, union coverage
    val toks = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(n).zipWithIndex.filter(_._1.size == n)
        .map { case (w, i) => (id, i + 1, w.mkString(" ")) }.toSeq
    }
    val byHash = wins.groupBy(_._3)
    val dupPos = wins.filter { case (id, _, w) =>
      byHash(w).exists(_._1 != id) ||
        byHash(w).count(o => o._1 == id) > byHash(w).count(_._1 == id)
    }
    val cover = dupPos.groupBy(_._1).map { case (id, ps) =>
      id -> ps.flatMap(p => p._2 until (p._2 + n)).toSet
    }
    val got = spans.groupBy(_._1).map { case (id, ss) =>
      id -> ss.flatMap(sp => sp._2 to sp._3).toSet
    }
    assert(got == cover)
  }

  test("duplicateSpanCuts: keeper is the first (doc, pos) occurrence; " +
      "applying the cut list leaves no n-window occurring twice") {
    val n = 3
    // cross-doc shared run (c0..c7), an intra-doc repeat inside doc
    // 3, and unique filler — keeper must be doc 1's copy (min id),
    // and doc 3's first intra-doc occurrence beats its second
    val shared = (0 until 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $shared a3 a4 a5"),
      (2L, s"b1 b2 b3 $shared b4 b5"),
      (3L, s"$shared d1 d2 d3 d4 $shared")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpanCuts(docs, "doc_id", "text", n)
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    // every shared window's first occurrence is in doc 1 (positions
    // 3..8 → merged keep-span [3, 10]); docs 2 and 3 carry only cuts
    assert(spans.filter(_._5).map(s => (s._1, s._2, s._3))
      == List((1L, 3L, 10L)))
    assert(spans.filterNot(_._5).forall(s => s._1 == 2L || s._1 == 3L))

    // APPLY the cuts: removed = cut coverage minus keep coverage per
    // doc; a window survives iff all n of its tokens survive
    val toks = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val byDoc = spans.groupBy(_._1)
    def coverage(id: Long, keep: Boolean): Set[Long] =
      byDoc.getOrElse(id, Nil).filter(_._5 == keep)
        .flatMap(s => s._2 to s._3).toSet
    val survivors = toks.toSeq.flatMap { case (id, ts) =>
      val removed = coverage(id, keep = false) -- coverage(id, keep = true)
      ts.sliding(n).zipWithIndex.filter(_._1.size == n).collect {
        case (w, i) if (i + 1 until i + 1 + n)
          .forall(p => !removed.contains(p.toLong)) =>
          (id, i + 1, w.mkString(" "))
      }.toSeq
    }
    val byText = survivors.groupBy(_._3)
    assert(byText.values.forall(_.size == 1),
      s"windows still duplicated: ${byText.filter(_._2.size > 1).keys}")
    // and every originally-duplicated window retains its keeper copy
    val allWins = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq }
    val dupTexts = allWins.groupBy(identity).filter(_._2.size > 1).keySet
    dupTexts.foreach(w => assert(byText.contains(w),
      s"duplicated window '$w' lost ALL copies"))
  }

  test("editDistancePairs: same-prefix small edits found, big edits cut by threshold") {
    val prefix = "shared forty-character document prefix xx "
    val docs = Seq(
      (1L, prefix + "tail one common words here"),
      (2L, prefix + "tail two common words here"),   // dist 3 from #1
      (3L, prefix + "completely different ending that rambles on for long enough to exceed any small edit budget"),
      (4L, "another prefix entirely " + prefix),      // blocked apart
      (5L, prefix + "tail one common words here")     // exact dup of #1
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text",
        blockPrefix = 40, maxDist = 8)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) within threshold; (1,5)/(2,5) because 5 duplicates 1;
    // 3 shares the block but exceeds maxDist; 4 never enters it
    assert(pairs == Set((1L, 2L, 3L), (1L, 5L, 0L), (2L, 5L, 3L)))
  }

  test("editDistancePairs: blocked join shuffles on the digest, no cartesian") {
    val docs = (1L to 100L)
      .map(i => (i, s"prefix ${i % 5} padded out to cover the block window " +
        s"body $i")).toDF("doc_id", "text")
    val plan = Dedup.editDistancePairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }
}
