package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity join by prefix filtering (the PPJoin/AllPairs
  * family) — the complement to MinHash-LSH: LSH trades recall for
  * bounded work, prefix filtering keeps EXACT results (every pair
  * with Jaccard ≥ t, no false negatives) while still never forming
  * the cross product. The guarantee: order every token set by one
  * GLOBAL rare-first order (ascending document frequency, token
  * tiebreak); two sets with Jaccard ≥ t MUST share a token inside
  * their first `|s| − ⌈t·|s|⌉ + 1` tokens, so candidates are an
  * equi-join on prefix tokens only — and rare-first ordering makes
  * those prefixes the least-shared tokens in the corpus, keeping
  * candidate lists short.
  *
  * Candidates are pruned three ways before verification — prefix
  * share, the length-ratio test, and the positional overlap bound
  * (the full PPJoin filter set; each is a necessary condition for
  * Jaccard ≥ t, so the result stays EXACT) — and only survivors pay
  * the array-intersect verification, the dominant cost.
  *
  * The threshold is a RATIONAL tNum/tDen and every test is integer
  * (`⌈t·l⌉ = (tNum·l + tDen − 1) div tDen`; verification is
  * `tDen·inter ≥ tNum·(|a|+|b|−inter)`), so the join replays
  * bit-for-bit in SQL. Shuffles: the df count, the sort-attach
  * aggregate, the prefix equi-join, and two array attachments —
  * all token- or id-keyed; skewed common tokens stay OUT of
  * prefixes by construction (they sort last).
  */
object SetJoin {

  /** `setCol` must be a DISTINCT-element array expression — the set
    * representation of each record (whole-doc token sets for short
    * records; w-SHINGLE sets for documents, where whole-doc sets
    * saturate a small vocabulary and stop discriminating — measured:
    * token-set Jaccard over this corpus's 40-word salads marks 75%
    * of ALL pairs as ≥ 0.6 near-dups, shingle sets mark the planted
    * variants only).
    */
  def jaccardJoin(docs: DataFrame, idCol: String,
      setCol: org.apache.spark.sql.Column,
      tNum: Int, tDen: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), setCol.as("__ts"))
    val dfq = toks.select(explode(col("__ts")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // one global order: (df asc, token asc) — struct array_sort is
    // field-lexicographic, exactly that order
    val sorted = toks.select(col("__id"), explode(col("__ts")).as("__t"))
      .join(dfq, "__t")
      .groupBy(col("__id"))
      .agg(expr("transform(array_sort(collect_list(struct(__df, __t)))," +
        " x -> x.__t)").as("__sts"))
      .withColumn("__l", size(col("__sts")))
    val pre = sorted.select(col("__id"), col("__l"),
      posexplode(expr(
        s"slice(__sts, 1, __l - ((__l * $tNum + $tDen - 1) div $tDen) + 1)"))
        .as(Seq("__p", "__pt")))
    // PPJoin's two candidate prunes, both exact (no false negatives):
    //  - LENGTH filter: J ≥ t and inter ≤ min(|a|,|b|), uni ≥
    //    max(|a|,|b|) force t·max ≤ min — applied inside the prefix
    //    join, before the pair ever reaches the aggregate;
    //  - POSITIONAL filter: at the FIRST shared prefix token (global
    //    rare-first order, so it has the minimal position in BOTH
    //    arrays simultaneously — min(__pa), min(__pb) is that one
    //    token), every shared token lies at-or-after it in both
    //    arrays, so inter ≤ min(|a|−pa, |b|−pb) with 0-based p; the
    //    pair survives only if that bound reaches the overlap
    //    threshold α = ⌈t·(|a|+|b|)/(1+t)⌉, integer-compared as
    //    bound·(tNum+tDen) ≥ tNum·(|a|+|b|).
    // Both tests are integer, so the SQL replay stays bit-exact.
    val cand = pre.select(col("__pt"), col("__id").as("id_a"),
        col("__l").as("__la"), col("__p").as("__pa"))
      .join(pre.select(col("__pt"), col("__id").as("id_b"),
        col("__l").as("__lb"), col("__p").as("__pb")), "__pt")
      .filter(col("id_a") < col("id_b"))
      .filter(greatest(col("__la"), col("__lb")) * tNum <=
        least(col("__la"), col("__lb")) * tDen)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("__pa")).as("__pa"), min(col("__pb")).as("__pb"),
        first(col("__la")).as("__fla"), first(col("__lb")).as("__flb"))
      .filter(least(col("__fla") - col("__pa"), col("__flb") - col("__pb"))
        * (tNum + tDen) >= (col("__fla") + col("__flb")) * tNum)
      .select(col("id_a"), col("id_b"))
    cand
      .join(sorted.select(col("__id").as("id_a"), col("__sts").as("__sa"),
        col("__l").as("__la")), "id_a")
      .join(sorted.select(col("__id").as("id_b"), col("__sts").as("__sb"),
        col("__l").as("__lb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("uni", (col("__la") + col("__lb")).cast("long") - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        expr("inter * 1000000 div uni").as("jacc_e6"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** EXACT asymmetric CONTAINMENT join: every pair (probe q, corpus
    * doc c) with `|q∩c| / |q| ≥ tNum/tDen` — the pairwise
    * decontamination report ("which benchmark item leaked into
    * which training doc"), where [[jaccardJoin]]'s symmetric
    * threshold would miss a short probe swallowed by a long doc and
    * [[Dedup.ngramOverlapAcross]] reports per-doc fractions without
    * attributing the probe.
    *
    * Same machinery as [[jaccardJoin]], asymmetric: only the PROBE
    * side is prefix-cut (with α = ⌈t·|q|⌉ shared tokens required,
    * pigeonhole puts one inside q's first `|q| − α + 1` tokens in
    * ANY fixed global order); the corpus side is fully indexed —
    * containment puts no upper bound on |c|, so there is no corpus
    * prefix, only the length prune `|c| ≥ α` inside the join and
    * the positional bound `min(|q|−pq, |c|−pc) ≥ α` after it (the
    * global rare-first order makes the first shared token carry
    * both minima). All tests integer; the SQL replay is exact.
    *
    * The global order is CORPUS document frequency (probe tokens
    * absent from the corpus get df 0 — they sort into the prefix
    * and match nothing, which only wastes prefix slots, never
    * correctness). Scale shape: the corpus explode is the classic
    * inverted index; candidate volume is Σ_prefix-token df with
    * rare-first prefixes, and text never shuffles — only tokens
    * and ids.
    */
  def containmentJoin(probes: DataFrame, corpus: DataFrame,
      qIdCol: String, qSet: org.apache.spark.sql.Column,
      cIdCol: String, cSet: org.apache.spark.sql.Column,
      tNum: Int, tDen: Int): DataFrame = {
    val qt = probes.select(col(qIdCol).as("__qid"), qSet.as("__qts"))
    val ct = corpus.select(col(cIdCol).as("__cid"), cSet.as("__cts"))
    val dfq = ct.select(explode(col("__cts")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    def sortSide(side: DataFrame, id: String, ts: String) = side
      .select(col(id), explode(col(ts)).as("__t"))
      .join(dfq, Seq("__t"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(0L)))
      .groupBy(col(id))
      .agg(expr("transform(array_sort(collect_list(struct(__df, __t)))," +
        " x -> x.__t)").as("__sts"))
      .withColumn("__l", size(col("__sts")))
    val sq = sortSide(qt, "__qid", "__qts")
    val sc = sortSide(ct, "__cid", "__cts")
    val preQ = sq.select(col("__qid"), col("__l").as("__lq"),
      posexplode(expr(
        s"slice(__sts, 1, __l - ((__l * $tNum + $tDen - 1) div $tDen) + 1)"))
        .as(Seq("__pq", "__pt")))
    val idxC = sc.select(col("__cid"), col("__l").as("__lc"),
      posexplode(col("__sts")).as(Seq("__pc", "__pt")))
    val cand = preQ.join(idxC, "__pt")
      // length prune: |c| ≥ inter ≥ α = ⌈t·|q|⌉
      .filter(col("__lc") * tDen >= col("__lq") * tNum)
      .groupBy(col("__qid"), col("__cid"))
      .agg(min(col("__pq")).as("__pq"), min(col("__pc")).as("__pc"),
        first(col("__lq")).as("__flq"), first(col("__lc")).as("__flc"))
      // positional bound: inter ≤ min(|q|−pq, |c|−pc), 0-based p
      .filter(least(col("__flq") - col("__pq"),
        col("__flc") - col("__pc")) * tDen >= col("__flq") * tNum)
      .select(col("__qid"), col("__cid"))
    cand
      .join(sq.select(col("__qid"), col("__sts").as("__sq"),
        col("__l").as("__lq")), "__qid")
      .join(sc.select(col("__cid"), col("__sts").as("__sc")), "__cid")
      .withColumn("inter",
        size(array_intersect(col("__sq"), col("__sc"))).cast("long"))
      .filter(col("inter") * tDen >= col("__lq") * tNum)
      .select(col("__qid").as("q_id"), col("__cid").as("c_id"),
        col("inter"), col("__lq").cast("long").as("q_len"),
        expr("inter * 1000000 div __lq").as("cont_e6"))
      .orderBy(col("q_id"), col("c_id"))
  }
}
