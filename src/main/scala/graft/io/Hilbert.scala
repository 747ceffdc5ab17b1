package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve layout index — [[Zorder]]'s continuous cousin. The
  * Morton curve takes square-diagonal jumps at every power-of-two
  * boundary (…0111 → …1000 teleports across the key space), so a
  * file covering an index range can straddle two distant rectangles;
  * the Hilbert curve moves ONE grid step per index step, so every
  * contiguous index range is one connected blob — strictly tighter
  * per-file bounding boxes at the same file count (HilbertSpec
  * measures the span reduction; Delta Lake added `HILBERT` clustering
  * over `ZORDER` for exactly this).
  *
  * Index construction is the standard xy→d walk: 16 rounds from the
  * top bit down, each deciding one base-4 digit from the current
  * quadrant and rotating the frame into the sub-square. A round is
  * THREE integer CASE/shift expressions over the previous round's
  * (x, y, d) — materialized as per-round intermediate COLUMNS, not
  * one nested expression (the tree would grow 3^16 nodes inlined;
  * as named columns the plan is a linear Project chain that
  * whole-stage codegen collapses). Pure integer arithmetic end to
  * end: the q173 oracle replays all 16 rounds as chained CTEs
  * bit-for-bit. Same 16-bit input scaling as [[Zorder]], shared via
  * `Zorder.withScaled`.
  */
object Hilbert {

  /** The xy→d walk as a plain JVM loop — the HOT-PATH form. The
    * column-expression chain below is the declarative reference
    * (and what the oracle replays), but profiled 10× slower at
    * sf0.1 (6.0 s vs 0.56 s warm): 48 chained Projects fall out of
    * whole-stage codegen and re-materialize the row per round. The
    * kernel is one call per row; HilbertSpec pins bit-equality
    * between the two forms (the `distinctNgramCountFast` pattern).
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def hilbertUdf(bits: Int) =
    udf { (x: Long, y: Long) => xy2d(bits, x, y) }

  /** Append the Hilbert index via the compiled kernel. */
  def withHilbertIndex(df: DataFrame, xCol: String, yCol: String,
      out: String, bits: Int = 16): DataFrame =
    df.withColumn(out,
      hilbertUdf(bits)(col(xCol).cast("long"), col(yCol).cast("long")))

  /** Append the 32-bit Hilbert index of the pre-scaled 16-bit pair
    * `(xCol, yCol)` as column `out` — the declarative per-round
    * column-chain form (what [[ctesSql]] replays; kept as the
    * spec-pinned reference for the kernel). Adds (and drops)
    * per-round working columns; input columns are preserved.
    */
  def withHilbertIndexExpr(df: DataFrame, xCol: String, yCol: String,
      out: String, bits: Int = 16): DataFrame = {
    val seeded = df
      .withColumn("__hx0", col(xCol).cast("long"))
      .withColumn("__hy0", col(yCol).cast("long"))
      .withColumn("__hd0", lit(0L))
    val folded = (0 until bits).foldLeft(seeded) { (acc, i) =>
      val s = 1L << (bits - 1 - i)
      val x = col(s"__hx$i"); val y = col(s"__hy$i"); val d = col(s"__hd$i")
      val rx = when(x.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(y.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      acc
        .withColumn(s"__rx$i", rx)
        .withColumn(s"__ry$i", ry)
        .withColumn(s"__hd${i + 1}",
          d + lit(s * s) * (lit(3L) * col(s"__rx$i"))
            .bitwiseXOR(col(s"__ry$i")))
        .withColumn(s"__hx${i + 1}",
          when(col(s"__ry$i") === 1L, x)
            .when(col(s"__rx$i") === 1L, lit(s - 1L) - y)
            .otherwise(y))
        .withColumn(s"__hy${i + 1}",
          when(col(s"__ry$i") === 1L, y)
            .when(col(s"__rx$i") === 1L, lit(s - 1L) - x)
            .otherwise(x))
        .drop(s"__hx$i", s"__hy$i", s"__hd$i", s"__rx$i", s"__ry$i")
    }
    folded
      .withColumn(out, col(s"__hd$bits"))
      .drop(s"__hx$bits", s"__hy$bits", s"__hd$bits")
  }

  /** Per-file bounding rectangles under Hilbert-prefix bucketing —
    * [[Zorder.fileStats]]'s shape with the Hilbert index (q173).
    */
  def fileStats(df: DataFrame, a: String, b: String,
      shift: Int): DataFrame =
    Zorder.curveFileStats(
      withHilbertIndex(
        Zorder.withScaled(
          df.select(col(a).cast("long").as("a"),
            col(b).cast("long").as("b")),
          "a", "b"),
        "__sa", "__sb", "__z")
        .drop("__sa", "__sb"),
      shift)

  /** The same 16-round walk as chained DuckDB CTEs over a relation
    * `s(a, b, sa, sb)` (scaled pair + carried originals). Ends with
    * `h(a, b, z)`. `xor()` is the DuckDB spelling (its `^` is
    * exponentiation — a silent wrong-answer trap, not a parse error).
    */
  def ctesSql(bits: Int = 16): String = {
    val seed =
      "h0 AS (SELECT a, b, sa AS hx, sb AS hy, 0::BIGINT AS hd FROM s)"
    val rounds = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      s"""p$i AS (SELECT a, b, hx, hy, hd,
         |  CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |  CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM h$i),
         |h${i + 1} AS (SELECT a, b,
         |  CASE WHEN ry = 1 THEN hx
         |       WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END AS hx,
         |  CASE WHEN ry = 1 THEN hy
         |       WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END AS hy,
         |  hd + ${s * s}::BIGINT * xor(3 * rx, ry) AS hd
         |  FROM p$i)""".stripMargin
    }
    ((seed +: rounds) :+
      s"h AS (SELECT a, b, hd AS z FROM h$bits)").mkString(",\n")
  }
}
