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

  test("graft_dot is SQL-callable once registered (extension builder path)") {
    // getOrCreate would reuse the shared spec session and skip
    // spark.sql.extensions, so register into its function registry
    // directly — the same (identifier, info, builder) triple
    // GraftExtensions injects at session build.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      children => FloatDotProduct(children.head, children(1)))
    val row = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .collect()(0)
    assert(row.getDouble(0) == 11.0)
  }
}
