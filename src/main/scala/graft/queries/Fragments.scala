package graft.queries

/** Oracle-SQL fragments shared across query packs. */
private[queries] object Fragments {

  /** DuckDB SQL computing [[graft.similarity.Ann.rhpSignature]] for a
    * 64-dim double-list expression `v` — same integer hash, same
    * double arithmetic order, so the signatures agree bit-for-bit.
    */
  def rhpSigSql(planes: Int, v: String): String =
    (0 until planes).map { j =>
      s"""(CASE WHEN list_sum(list_transform(range(0, 64), d ->
         |  $v[d+1] * ((((d * 2654435761 + ${j.toLong * 40503L + 17L}) % 1000 + 1000) % 1000)
         |            / 500.0 - 1.0))) > 0
         | THEN 1::BIGINT << $j ELSE 0::BIGINT END)""".stripMargin
    }.mkString(" + ")
}
