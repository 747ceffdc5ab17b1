package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Ann

class FloatDotProductSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(0.1f, 0.2f), Seq(0.3f, 0.4f)),
    (Seq.empty[Float], Seq.empty[Float])
  ).toDF("a", "b")

  test("expression, UDF and HOF forms produce identical doubles") {
    val rows = vecs.select(
      Ann.dot($"a", $"b").as("native"),
      Ann.dotUdf($"a", $"b").as("viaUdf"),
      Ann.dotExpr($"a", $"b").as("viaHof"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (n, u, h) =>
      assert(n == u && n == h, s"mismatch: $n / $u / $h")
    }
    assert(rows(0)._1 == 32.0)
  }

  test("null inputs yield null") {
    val out = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(Ann.dot($"a", $"b").as("d"))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("interpreted eval path (nullSafeEval) matches codegen") {
    // force the interpreted path by evaluating the expression directly
    val expr = FloatDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null) == 11.0)
  }

  test("graft_* SQL functions resolve via spark.sql.extensions") {
    // GraftSession.configure sets spark.sql.extensions, and the spec
    // session is built through it — no manual registration needed.
    val row = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d, " +
        "graft_simhash60(array('alpha', 'beta')) AS s")
      .collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) != 0L)
    val terms = spark.sql(
      "SELECT t.* FROM (SELECT array('a', 'b', 'a') AS toks) " +
        "LATERAL VIEW graft_term_counts(toks) t AS term, tf")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(terms == Map("a" -> 2, "b" -> 1))
  }
}
