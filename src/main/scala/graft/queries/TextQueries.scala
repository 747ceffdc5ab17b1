package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table
import graft.text.{Rake, TextFunctions => T, Tfidf}

/** Text-analysis surface over the documents table: tokenization,
  * n-grams, TF-IDF, RAKE, language ID, quality scoring, token
  * counting, fingerprinting (SURVEY.md §2.9 + LLM-pipeline
  * extensions). All per-row kernels are map-side column expressions;
  * corpus-level ops (tfidf, top tokens) shuffle once on their
  * aggregation key.
  */
object TextQueries extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Collocation extraction (text.Collocations): bigram pairs
    // scored by exact-integer Pearson χ² against the corpus bigram
    // stream — the log-free collocation statistic, so the ranking
    // replays bit-for-bit in SQL. Vocabulary-sized marginals, one
    // Generate, ordered top-20.
    "q184_collocations" -> ((s, dir) => {
      graft.text.Collocations.topByChi2(
        table(s, dir, "documents"), "text", minCount = 5, k = 20)
    }),

    // Corpus token histogram (A3's word-count, NewsLDA.scala:77-81 —
    // reduceByKey → groupBy.count with map-side partial agg).
    "q32_top_tokens" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // Bigram histogram via the higher-order ngram kernel (M1).
    "q33_top_bigrams" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(explode(T.ngramsFast(T.tokens(col("text")), 2)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    }),

    // Exact TF-IDF with the reference's smoothing (M3), top-5 terms
    // per doc for a fixed doc slice; df/idf computed corpus-wide.
    "q34_doc_tfidf" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      Tfidf.topTerms(docs, "doc_id", "toks", 5)
        .filter(col("doc_id") < 10)
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Quality metrics + gate (training-data extension).
    "q35_quality" -> ((s, dir) => {
      table(s, dir, "documents")
        .withColumn("toks", T.tokens(col("text")))
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          size(col("toks")).as("n_tokens"),
          T.avgTokenLen(col("toks")).as("avg_token_len"),
          T.punctRatio(col("text")).as("punct_ratio"),
          T.stopwordRatio(col("toks")).as("stopword_ratio"),
          T.qualityOk(col("text"), col("toks")).as("quality_ok"))
        .orderBy(col("doc_id"))
    }),

    // BPE-ish token counting (regex extraction, codegen'd).
    "q36_token_count" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          size(T.tokens(col("text"))).as("ws_tokens"),
          T.tokenCountBpe(col("text")).as("bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Order-independent bag-of-words fingerprint (dedup key).
    "q37_fingerprint" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          T.fingerprint(T.tokens(col("text"))).as("fp"),
          T.contentHash(col("text")).as("exact_hash"))
        .orderBy(col("doc_id"))
    }),

    // Heuristic language ID (marker-word argmax).
    "q38_langid" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          T.langId(T.tokens(col("text"))).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Cohen's κ of the q38 marker-word language ID against the true
    // lang label (ops.Eval.cohenKappaE6) — chance-corrected
    // multi-class agreement, pure integer with a sign-guarded e6
    // division; the eval the langid gate needs because raw accuracy
    // flatters overlapping marginals. One (n, agree) aggregate + one
    // label-domain-bounded marginal aggregate.
    "q199_langid_kappa" -> ((s, dir) => {
      graft.ops.Eval.cohenKappaE6(
        table(s, dir, "documents")
          .select(
            T.langId(T.tokens(col("text"))).as("lang_pred"),
            col("lang")),
        "lang_pred", "lang")
    }),

    // RAKE keywords (M6): sentences split on punctuation, candidate
    // phrases are maximal stopword-free runs (length-3 windows for
    // longer runs), word score = (degree+freq)/freq, phrase score =
    // rounded sum — fully replayed by the DuckDB oracle below
    // (lateral-unnest run segmentation + the same rational score).
    "q39_rake" -> ((s, dir) => {
      table(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          explode(Rake.rakeUdf(topK = 5)(col("text"))).as("kw"))
        .select(col("doc_id"), col("kw.phrase").as("phrase"),
          col("kw.score").as("score"))
        .orderBy(col("doc_id"), col("score").desc, col("phrase"))
    }),

    // Per-(source, lang) corpus report: volume, length, exact-dup
    // rate — the curation dashboard a crawl pipeline runs per shard.
    // One aggregation pass; dup rate counts distinct digests, never
    // shuffling text.
    "q104_source_stats" -> ((s, dir) => {
      table(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 2).as("avg_chars"),
          countDistinct(md5(col("text"))).as("n_unique"))
        .withColumn("dup_rate",
          round(lit(1.0) - col("n_unique") / col("n_docs"), 4))
        .orderBy(col("source"), col("lang"))
    }),

    // Corpus n-gram statistics for n=1..3 (occurrences + distinct),
    // the shape of the reference's ngram corpus jobs (M1/M14).
    // Unicode accent folding (T.foldAccents, NFKD kernel): applied
    // to a synthesized diacritics prefix + each doc's text so the
    // normalization itself is what the oracle hash-checks
    // (DuckDB replays with lower(strip_accents(...))).
    "q121_fold_accents" -> ((s, dir) => {
      table(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), T.foldAccents(
          concat(lit("Café NAÏVE Zürich señor Çedilla ÀÈÌÒÙ #"),
            col("text"))).as("norm"))
        .orderBy(col("doc_id"))
    }),

    "q40_ngram_stats" -> ((s, dir) => {
      // Single scan: each n's grams are tagged (n, gram) and exploded
      // together by ONE compiled sliding pass (the q107 kernel — the
      // earlier flatten-of-transforms struct tagging ran interpreted),
      // then one grouped aggregate. The distinct key is xxhash64 of
      // the gram, not the gram text: the distinct shuffle moves 8-byte
      // longs instead of n-gram strings (the project's digest-not-text
      // rule), and count(DISTINCT digest) = count(DISTINCT gram) as
      // long as the digest is injective on the observed domain —
      // expected 64-bit collisions at the ~1e6 distinct grams here are
      // ~1e-7. At corpora where 64-bit collisions become material
      // (~1e9+ distinct), the right answer is approx_count_distinct
      // with a tuned rsd, not a wider exact shuffle.
      table(s, dir, "documents")
        .select(T.tokens(col("text")).as("toks"))
        .select(explode(T.taggedNgramsFast(col("toks"), 1, 3)).as("t"))
        .groupBy(col("t._1").as("n"))
        .agg(count(lit(1)).as("occurrences"),
          countDistinct(xxhash64(col("t._2"))).as("n_distinct"))
        .orderBy(col("n"))
    }),

    // BM25 top-20 for a fixed query (M3's ranking successor).
    // Per-(doc,term) contributions floor to integer millionths
    // before the per-doc sum, so the ranking is an exact integer
    // comparison and the oracle mirrors the IEEE op order.
    "q131_bm25" -> ((s, dir) => {
      Tfidf.bm25TopK(table(s, dir, "documents"), "doc_id", "text",
        Seq("hash", "join", "vector"), k = 20)
    }),

    // Zipf slope: least-squares fit of ln(freq) on ln(rank) over the
    // top-100 token frequencies — the corpus-health statistic that
    // flags synthetic/templated text (natural corpora fit ≈ −1).
    // Histogram shuffles once (partial agg on token); top-100 is
    // TakeOrderedAndProject (per-partition top-k); the regression
    // runs over 100 rows, so the unpartitioned rank window is
    // k-bounded, never corpus-bounded.
    "q133_zipf_slope" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val top = table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("token")).limit(100)
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      top.withColumn("r",
          row_number().over(Window.orderBy(col("f").desc, col("token"))))
        .select(log(col("r").cast("double")).as("x"),
          log(col("f").cast("double")).as("y"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(round(slope, 6).as("zipf_slope"),
          round((col("sy") - slope * col("sx")) / col("n"), 6)
            .as("intercept"))
    }),

    // PMI collocations: top-20 bigrams by pointwise mutual
    // information (support ≥ 5) — the classic collocation detector
    // for multi-word expressions. PMI floors to integer millionths
    // (exact ranking, SQL-replayed in IEEE op order). Corpus totals
    // come from ONE doc-stats scan (Σ len, Σ len−1), never from
    // re-aggregating the gram tables; the bigram table equi-joins
    // unigram counts on each word (sort-merge at corpus scale, AQE
    // broadcast at toy scale).
    "q135_pmi_bigrams" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val stats = docs.select(size(T.tokens(col("text"))).as("n"))
        .agg(sum(col("n")).cast("double").as("tu"),
          sum(col("n") - lit(1)).cast("double").as("tb"))
      val uni = docs.select(explode(T.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val bi = docs
        .select(explode(T.ngramsFast(T.tokens(col("text")), 2)).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 5)
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
      val pmi = floor(lit(1e6) * log((col("cxy") / col("tb")) /
        ((col("cx") / col("tu")) * (col("cy") / col("tu"))))).cast("long")
      bi.join(uni.select(col("w").as("w1"), col("cw").as("cx")), "w1")
        .join(uni.select(col("w").as("w2"), col("cw").as("cy")), "w2")
        .crossJoin(broadcast(stats))
        .select(col("bg").as("bigram"), col("cxy"), pmi.as("pmi_fx"))
        .orderBy(col("pmi_fx").desc, col("bigram"))
        .limit(20)
    }),

    // Per-paragraph language consistency — mixed-language page
    // detection (CCNet drops pages whose paragraphs disagree):
    // paragraph-level langid (the q38 marker kernel, map-side), then
    // per-doc paragraph count, distinct non-und langs, and the
    // majority-language share in fixed-point e4. One (doc,lang)
    // shuffle; everything before it fuses into the scan.
    "q141_lang_consistency" -> ((s, dir) => {
      val counts = table(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(split(col("text"), "\n")).as("para"))
        .filter(length(trim(col("para"))) > 0)
        .select(col("doc_id"), T.langId(T.tokens(col("para"))).as("pl"))
        .groupBy(col("doc_id"), col("pl")).agg(count(lit(1)).as("c"))
      counts.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_paras"),
          countDistinct(when(col("pl") =!= "und", col("pl")))
            .as("n_langs"),
          max(col("c")).as("__maxc"))
        .select(col("doc_id"), col("n_paras"), col("n_langs"),
          floor(lit(1e4) * col("__maxc") / col("n_paras")).cast("long")
            .as("major_share_e4"))
        .orderBy(col("doc_id"))
    })
  )

  private val splitToks = "string_split(text, ' ')"

  /** RAKE oracle: replays Rake.extract in SQL. Run segmentation =
    * cumulative stopword count as the run id; long runs window to 3;
    * scores rank on the ROUNDED value (matching the kernel), so
    * sub-ulp sum-order differences can't flip a rank.
    */
  private val rakeOracle = {
    val stopList = graft.text.TextFunctions.stopwordsEn
      .map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, lower(text) AS t
       |           FROM documents WHERE doc_id < 100),
       |sl AS (SELECT doc_id, string_split_regex(t, '[.!?;:]+') AS ss FROM d),
       |sent AS (SELECT doc_id, u.si, ss[u.si] AS s
       |         FROM sl, unnest(generate_series(1, len(ss))) AS u(si)),
       |tk AS (SELECT doc_id, si,
       |         list_filter(string_split_regex(s, '[^a-z0-9'']+'),
       |                     x -> x != '') AS toks
       |       FROM sent),
       |tok AS (SELECT doc_id, si, u.ti, toks[u.ti] AS w,
       |          toks[u.ti] IN ($stopList) AS stop
       |        FROM tk, unnest(generate_series(1, len(toks))) AS u(ti)),
       |marked AS (SELECT doc_id, si, ti, w, stop,
       |            sum(CASE WHEN stop THEN 1 ELSE 0 END)
       |              OVER (PARTITION BY doc_id, si ORDER BY ti) AS rid
       |           FROM tok),
       |runs AS (SELECT doc_id, si, rid, list(w ORDER BY ti) AS run
       |         FROM marked WHERE NOT stop GROUP BY doc_id, si, rid),
       |cand AS (
       |  SELECT doc_id, run AS ph FROM runs WHERE len(run) <= 3
       |  UNION ALL
       |  SELECT doc_id, run[u.wi:u.wi+2] AS ph
       |  FROM runs, unnest(generate_series(1, len(run) - 2)) AS u(wi)
       |  WHERE len(run) > 3),
       |cw AS (SELECT doc_id, ph, unnest(ph) AS w FROM cand),
       |ws AS (SELECT doc_id, w, count(*) AS freq,
       |         sum(len(ph) - 1) AS deg
       |       FROM cw GROUP BY doc_id, w),
       |dph AS (SELECT DISTINCT doc_id, ph FROM cand),
       |dw AS (SELECT doc_id, ph, unnest(ph) AS w FROM dph),
       |scored AS (
       |  SELECT dw.doc_id, array_to_string(dw.ph, ' ') AS phrase,
       |    round(sum((ws.deg + ws.freq) * 1.0 / ws.freq), 4) AS score
       |  FROM dw JOIN ws ON dw.doc_id = ws.doc_id AND dw.w = ws.w
       |  GROUP BY dw.doc_id, dw.ph),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |         ORDER BY score DESC, phrase) AS rn FROM scored)
       |SELECT doc_id, phrase, score FROM rk WHERE rn <= 5
       |ORDER BY doc_id, score DESC, phrase""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q184_collocations" ->
      s"""WITH t AS (SELECT $splitToks AS l FROM documents),
         |bg AS (SELECT l[i] AS w1, l[i + 1] AS w2
         |  FROM t, range(1, 200) r(i) WHERE i < len(l)),
         |ab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS a
         |  FROM bg GROUP BY w1, w2 HAVING count(*) >= 5),
         |m1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1
         |  FROM bg GROUP BY w1),
         |m2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n2
         |  FROM bg GROUP BY w2),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg),
         |x AS (SELECT ab.w1, ab.w2, a, n1 - a AS b, n2 - a AS c,
         |    n - n1 - n2 + a AS d, n
         |  FROM ab JOIN m1 ON ab.w1 = m1.w1
         |          JOIN m2 ON ab.w2 = m2.w2 CROSS JOIN nt)
         |SELECT w1, w2, a AS n_ab,
         |  CAST(CASE WHEN (a+b) = 0 OR (c+d) = 0
         |      OR (a+c) = 0 OR (b+d) = 0 THEN NULL
         |    ELSE (n::HUGEINT * (a*d - b*c)::HUGEINT * (a*d - b*c))
         |      // ((a+b)::HUGEINT * (c+d) * (a+c) * (b+d)) END
         |    AS BIGINT) AS chi2
         |FROM x ORDER BY chi2 DESC, w1, w2 LIMIT 20""".stripMargin,
    "q39_rake" -> rakeOracle,
    "q104_source_stats" ->
      """SELECT source, lang, cast(count(*) as bigint) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  cast(count(DISTINCT md5(text)) as bigint) AS n_unique,
        |  round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 4)
        |    AS dup_rate
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,
    "q32_top_tokens" ->
      s"""SELECT token, cast(count(*) as bigint) AS n
         |FROM (SELECT unnest($splitToks) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q33_top_bigrams" ->
      s"""WITH t AS (SELECT $splitToks AS toks FROM documents)
         |SELECT array_to_string(toks[i:i+1], ' ') AS bigram,
         |       cast(count(*) as bigint) AS n
         |FROM t, range(1, 200) r(i)
         |WHERE i + 1 <= len(toks)
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q34_doc_tfidf" ->
      s"""WITH tfc AS (
         |  SELECT doc_id, term, cast(count(*) as bigint) AS tf
         |  FROM (SELECT doc_id, unnest($splitToks) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |dfc AS (SELECT term, cast(count(*) as bigint) AS df
         |        FROM tfc GROUP BY term),
         |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         |sc AS (
         |  SELECT doc_id, tfc.term AS term, tf, df,
         |         round(ln((n + 1.0) / (df + 1.0)), 4) AS idf,
         |         round(tf * ln((n + 1.0) / (df + 1.0)), 4) AS tfidf
         |  FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN nn),
         |rk AS (
         |  SELECT *, cast(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term) as int) AS rank FROM sc)
         |SELECT doc_id, term, tf, df, idf, tfidf, rank
         |FROM rk WHERE rank <= 5 AND doc_id < 10
         |ORDER BY doc_id, rank""".stripMargin,
    "q35_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $splitToks AS toks FROM documents)
         |SELECT doc_id,
         | cast(length(text) as int) AS n_chars,
         | cast(len(toks) as int) AS n_tokens,
         | round(length(replace(text, ' ', '')) * 1.0 / len(toks), 4) AS avg_token_len,
         | round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 1.0 / length(text), 4) AS punct_ratio,
         | round(len(list_filter(toks, x -> list_contains(
         |   ['the','a','an','of','and','to','in','is','it','for','on','with','as','at','by','this','that'], x))) * 1.0 / len(toks), 4) AS stopword_ratio,
         | (length(text) >= 100
         |  AND round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 1.0 / length(text), 4) <= 0.1
         |  AND round(len(list_filter(toks, x -> list_contains(
         |   ['the','a','an','of','and','to','in','is','it','for','on','with','as','at','by','this','that'], x))) * 1.0 / len(toks), 4) >= 0.01) AS quality_ok
         |FROM t ORDER BY doc_id""".stripMargin,
    "q36_token_count" ->
      s"""SELECT doc_id,
         | cast(len($splitToks) as int) AS ws_tokens,
         | cast(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) as int) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q37_fingerprint" ->
      s"""SELECT doc_id,
         | md5(array_to_string(list_sort(list_distinct($splitToks)), ' ')) AS fp,
         | md5(text) AS exact_hash
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q38_langid" ->
      s"""WITH t AS (SELECT doc_id, $splitToks AS toks FROM documents),
         |s AS (SELECT doc_id,
         | len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS en,
         | len(list_filter(toks, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS es,
         | len(list_filter(toks, x -> list_contains(['le','les','de','et','une','est','dans'], x))) AS fr,
         | len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','nicht'], x))) AS de
         |FROM t)
         |SELECT doc_id,
         | CASE WHEN en=0 AND es=0 AND fr=0 AND de=0 THEN 'und'
         |      WHEN en>=es AND en>=fr AND en>=de THEN 'en'
         |      WHEN es>=fr AND es>=de THEN 'es'
         |      WHEN fr>=de THEN 'fr'
         |      ELSE 'de' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,
    "q199_langid_kappa" ->
      s"""WITH t AS (SELECT lang, $splitToks AS toks FROM documents),
         |s AS (SELECT lang,
         | len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS en,
         | len(list_filter(toks, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS es,
         | len(list_filter(toks, x -> list_contains(['le','les','de','et','une','est','dans'], x))) AS fr,
         | len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','nicht'], x))) AS de
         |FROM t),
         |p AS MATERIALIZED (SELECT lang AS b,
         | CASE WHEN en=0 AND es=0 AND fr=0 AND de=0 THEN 'und'
         |      WHEN en>=es AND en>=fr AND en>=de THEN 'en'
         |      WHEN es>=fr AND es>=de THEN 'es'
         |      WHEN fr>=de THEN 'fr'
         |      ELSE 'de' END AS a
         |FROM s),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_agree FROM p),
         |u AS (SELECT a AS l, 0 AS side FROM p
         |  UNION ALL SELECT b, 1 FROM p),
         |m AS (SELECT l,
         |  sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS na,
         |  sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS nb
         |  FROM u GROUP BY l),
         |pe AS (SELECT sum(na::HUGEINT * nb) AS pe FROM m)
         |SELECT n, n_agree,
         |  CAST(CASE WHEN n::HUGEINT * n - pe = 0 THEN NULL ELSE
         |    (CASE WHEN n::HUGEINT * n_agree - pe < 0 THEN -1 ELSE 1 END)
         |    * (abs(n::HUGEINT * n_agree - pe) * 1000000
         |       // (n::HUGEINT * n - pe)) END AS BIGINT) AS kappa_e6
         |FROM tot, pe""".stripMargin,
    "q121_fold_accents" ->
      """SELECT doc_id,
        |  lower(strip_accents('Café NAÏVE Zürich señor Çedilla ÀÈÌÒÙ #'
        |    || text)) AS norm
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q40_ngram_stats" ->
      s"""WITH t AS (SELECT $splitToks AS toks FROM documents),
         |grams AS (
         |  SELECT n.n AS n, array_to_string(toks[i:i+n.n-1], ' ') AS gram
         |  FROM t, range(1, 4) n(n), range(1, 200) r(i)
         |  WHERE i + n.n - 1 <= len(toks))
         |SELECT cast(n as int) AS n,
         | cast(count(*) as bigint) AS occurrences,
         | cast(count(DISTINCT gram) as bigint) AS n_distinct
         |FROM grams GROUP BY n ORDER BY n""".stripMargin,
    "q131_bm25" ->
      s"""WITH ${Fragments.bm25ScoresSql(Seq("hash", "join", "vector"))}
         |SELECT doc_id, bm25 FROM bm
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q133_zipf_slope" ->
      s"""WITH f AS (SELECT token, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT unnest($splitToks) AS token FROM documents)
         |  GROUP BY token ORDER BY f DESC, token LIMIT 100),
         |r AS (SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r
         |      FROM f),
         |xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
         |              ln(CAST(f AS DOUBLE)) AS y FROM r),
         |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
         |             sum(y) AS sy, sum(x * y) AS sxy,
         |             sum(x * x) AS sxx FROM xy)
         |SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         |         AS zipf_slope,
         |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
         |              * sx) / n, 6) AS intercept
         |FROM a""".stripMargin,
    "q135_pmi_bigrams" ->
      s"""WITH t AS (SELECT $splitToks AS toks FROM documents),
         |st AS (SELECT CAST(sum(len(toks)) AS DOUBLE) AS tu,
         |              CAST(sum(len(toks) - 1) AS DOUBLE) AS tb FROM t),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
         |        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         |bi AS (SELECT bg, CAST(count(*) AS BIGINT) AS cxy
         |       FROM (SELECT unnest(list_transform(
         |               generate_series(1, len(toks) - 1),
         |               i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t)
         |       GROUP BY bg HAVING count(*) >= 5),
         |j AS (SELECT bg AS bigram, cxy,
         |        CAST(floor(1e6 * ln((cxy / tb)
         |               / ((u1.cw / tu) * (u2.cw / tu)))) AS BIGINT)
         |          AS pmi_fx
         |      FROM bi
         |      JOIN uni u1 ON string_split(bg, ' ')[1] = u1.w
         |      JOIN uni u2 ON string_split(bg, ' ')[2] = u2.w
         |      CROSS JOIN st)
         |SELECT bigram, cxy, pmi_fx FROM j
         |ORDER BY pmi_fx DESC, bigram LIMIT 20""".stripMargin,
    "q141_lang_consistency" ->
      """WITH p AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS para
        |           FROM documents WHERE doc_id < 200),
        |pp AS (SELECT doc_id, string_split(para, ' ') AS toks
        |       FROM p WHERE length(trim(para)) > 0),
        |s AS (SELECT doc_id,
        | len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS en,
        | len(list_filter(toks, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS es,
        | len(list_filter(toks, x -> list_contains(['le','les','de','et','une','est','dans'], x))) AS fr,
        | len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','nicht'], x))) AS de
        |FROM pp),
        |l AS (SELECT doc_id,
        | CASE WHEN en=0 AND es=0 AND fr=0 AND de=0 THEN 'und'
        |      WHEN en>=es AND en>=fr AND en>=de THEN 'en'
        |      WHEN es>=fr AND es>=de THEN 'es'
        |      WHEN fr>=de THEN 'fr'
        |      ELSE 'de' END AS pl
        |FROM s),
        |c AS (SELECT doc_id, pl, CAST(count(*) AS BIGINT) AS c
        |      FROM l GROUP BY doc_id, pl)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_paras,
        |  CAST(count(DISTINCT CASE WHEN pl <> 'und' THEN pl END) AS BIGINT)
        |    AS n_langs,
        |  CAST(floor(1e4 * max(c) / sum(c)) AS BIGINT) AS major_share_e4
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
