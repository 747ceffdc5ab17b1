package graft.queries

/** Oracle-SQL fragments shared across query packs. */
private[queries] object Fragments {

  /** DuckDB SQL computing [[graft.similarity.Ann.rhpSignature]] for a
    * 64-dim double-list expression `v` — same integer hash, same
    * double arithmetic order, so the signatures agree bit-for-bit.
    */
  /** BM25 score CTE chain replaying [[graft.text.Tfidf.bm25Scores]]
    * (k1=1.2, b=0.75) for `terms` over `documents` — identical IEEE
    * op order to the Spark contribution expression, per-(doc,term)
    * contributions floored to integer millionths before the per-doc
    * sum. Ends with relation `bm(doc_id, bm25)`.
    */
  def bm25ScoresSql(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(dl) AS DOUBLE) AS sdl FROM dl),
       |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
       |       WHERE term IN ($inList)
       |       GROUP BY doc_id, dl, term),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |        FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id,
       |  CAST(floor(1e6 * ln((n - df + 0.5) / (df + 0.5) + 1.0)
       |    * (tf * 2.2)
       |    / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sdl / n))))
       |    AS BIGINT) AS s
       |  FROM tf JOIN dfq USING (term) CROSS JOIN st),
       |bm AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS bm25
       |       FROM sc GROUP BY doc_id)""".stripMargin
  }

  def rhpSigSql(planes: Int, v: String): String =
    // quadratic pair-hash weights (k = j·1024 + d) — must stay
    // bit-identical to Ann.hyperplane/rhpSigUdf; the affine form it
    // replaced made planes near-parallel (PERF.md r13)
    (0 until planes).map { j =>
      s"""(CASE WHEN list_sum(list_transform(range(0, 64), d ->
         |  $v[d+1] * ((((d + ${j.toLong * 1024L + 1L}) * (d + ${j.toLong * 1024L + 2L}) % 1000000)
         |             * 2654435761) % 1000
         |            / 500.0 - 1.0))) > 0
         | THEN 1::BIGINT << $j ELSE 0::BIGINT END)""".stripMargin
    }.mkString(" + ")
}
