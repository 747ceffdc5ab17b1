package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the assembled query surface —
  * things `flatMap(_.defs).toMap` would otherwise break silently.
  */
class EntrySpec extends AnyFunSuite {

  private val packs = Seq(
    graft.queries.RelationalQueries, graft.queries.FunctionQueries,
    graft.queries.WindowQueries, graft.queries.TextQueries,
    graft.queries.DedupQueries, graft.queries.NlpQueries,
    graft.queries.MlQueries, graft.queries.GraphQueries,
    graft.queries.EventQueries, graft.queries.MediaQueries,
    graft.queries.StructQueries, graft.queries.TimeJoinQueries,
    graft.queries.VectorQueries, graft.queries.AnalyticQueries,
    graft.queries.PipelineQueries, graft.queries.CurationQueries)

  test("query names are unique across packs (toMap drops dups silently)") {
    val all = packs.flatMap(_.defs.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(all.size == SparkEntry.queries.size)
  }

  test("bench short keys (prefix before '_') are unique") {
    // Bench.scala truncates names at the first underscore for the
    // driver's 2000-char stdout window — a collision would merge two
    // queries' timings into one JSON key
    val shorts = SparkEntry.queries.keys.toSeq
      .map(k => { val i = k.indexOf('_'); if (i > 0) k.substring(0, i) else k })
    val dups = shorts.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"colliding bench keys: ${dups.mkString(", ")}")
  }

  test("every oracle key names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("query names follow the qNN_name driver convention") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("^q\\d+_[a-z0-9_]+$"))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }

  test("oracles use WITH RECURSIVE only for actually-recursive CTEs") {
    // DuckDB skips UNION dedup inside NON-recursive CTEs when the
    // clause is declared RECURSIVE (found via q139: duplicate edges
    // flipped a vote argmax at sf0.1 only). Guard: RECURSIVE is
    // allowed only when the SQL contains a self-referencing CTE —
    // the graph oracles' reach(a, b) pattern, or a `name AS (...)`
    // whose body reads FROM itself (q160's per-sample state walk).
    val selfRef = "(?s).*\\b(\\w+) AS \\(.*FROM \\1\\b.*".r
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql)
          if sql.toUpperCase.contains("WITH RECURSIVE") &&
            !sql.contains("reach(") &&
            !selfRef.matches(sql) =>
        name
    }
    assert(offenders.isEmpty,
      s"non-recursive oracles declared RECURSIVE: ${offenders.mkString(", ")}")
  }
}
