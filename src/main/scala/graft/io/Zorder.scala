package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) multi-column layout — the STORAGE-side
  * answer to point/range queries on MORE THAN ONE column. A single
  * sort key gives perfect file-level min/max pruning on that key and
  * none on any other; interleaving the bits of two keys gives every
  * file a small rectangle in (a, b) space, so min/max footer stats
  * prune on BOTH dimensions (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * idiom, built here from plain column expressions).
  *
  * The keys are first normalized to a common 16-bit scale —
  * `(v - min) * 65535 div span`, exact integer arithmetic — because
  * interleaving RAW bits is only balanced when both dimensions have
  * similar bit widths: a key spanning 4 bits interleaved against one
  * spanning 20 contributes nothing to the curve's upper levels and
  * gets no pruning (measured, not hypothetical: ZorderSpec's layout
  * test fails on raw interleave for exactly this reason). Min/max
  * come from a 1-row aggregate broadcast back onto the scan — the
  * same two-pass shape `OPTIMIZE ZORDER` uses; no driver collect.
  *
  * At 100 TB the layout is paid once at ingest (one range
  * repartition on the z-value) and amortized over every later scan
  * that filters on either key: a selective point query touches
  * O(sqrt(files)) files instead of all of them (ZorderSpec measures
  * the actual ratio on written parquet). Everything is shift/mask/
  * integer-div expressions — whole-stage codegen, no UDF; the q167
  * oracle replays the identical arithmetic in SQL. See [[Hilbert]]
  * for the continuous-curve variant with strictly better locality.
  */
object Zorder {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (0bxxxx -> 0b0x0x0x0x), the standard mask-shift
    * cascade. All arithmetic is on non-negative longs.
    */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of the low 16 bits of `a` (even bit
    * positions) and `b` (odd positions).
    */
  def zvalue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The same cascade as [[spread16]] rendered as DuckDB SQL, so
    * oracles can replay the interleave bit-for-bit.
    */
  def spread16Sql(e: String): String = {
    val x0 = s"(($e) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  def zvalueSql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Append 16-bit-scaled copies of `(a, b)` as `__sa`/`__sb`:
    * min/max of each key from one tiny aggregate, broadcast back,
    * each key mapped to 0..65535 by exact integer division (`div` —
    * no floats, so any engine reproduces it bit-for-bit). Two passes
    * over the input by construction, like any stats-then-rewrite
    * layout pass. Shared by the Morton and Hilbert layouts.
    */
  private[io] def withScaled(df: DataFrame, a: String,
      b: String): DataFrame = {
    val stats = df.agg(
      min(col(a).cast("long")).as("__amin"),
      max(col(a).cast("long")).as("__amax"),
      min(col(b).cast("long")).as("__bmin"),
      max(col(b).cast("long")).as("__bmax"))
    df.crossJoin(broadcast(stats))
      .withColumn("__sa", expr(
        s"((cast($a as bigint) - __amin) * 65535)" +
          " div greatest(__amax - __amin, 1)"))
      .withColumn("__sb", expr(
        s"((cast($b as bigint) - __bmin) * 65535)" +
          " div greatest(__bmax - __bmin, 1)"))
      .drop("__amin", "__amax", "__bmin", "__bmax")
  }

  /** Append the scaled Morton z-value of `(a, b)` as `zName`. */
  def withScaledZ(df: DataFrame, a: String, b: String,
      zName: String): DataFrame =
    withScaled(df, a, b)
      .withColumn(zName, zvalue(col("__sa"), col("__sb")))
      .drop("__sa", "__sb")

  /** Re-write `df` z-ordered on `(a, b)`: range-partition on the
    * scaled z-value into `files` output files, sort within each,
    * write. The one ingest-time shuffle that buys two-dimensional
    * pruning on every later scan.
    */
  def writeZordered(df: DataFrame, a: String, b: String,
      path: String, files: Int): Unit =
    withScaledZ(df, a, b, "__z")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** File-layout statistics under fixed curve-prefix bucketing:
    * file = `index >> shift`, so each "file" covers one aligned
    * index range exactly as a curve-ordered write lays them down —
    * but computed as a plain parallel aggregate (no global sort, no
    * window), deterministic at any scale. Emits each file's bounding
    * rectangle and its side spans: the min/max stats a reader would
    * prune against. With a 32-bit index, `shift = 24` yields at most
    * 256 files.
    */
  private[io] def curveFileStats(scaledWithIndex: DataFrame,
      shift: Int): DataFrame =
    scaledWithIndex
      .withColumn("file_id", shiftright(col("__z"), shift))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .withColumn("span_a", col("max_a") - col("min_a"))
      .withColumn("span_b", col("max_b") - col("min_b"))

  /** [[curveFileStats]] under the Morton z-order (q167's surface). */
  def fileStats(df: DataFrame, a: String, b: String,
      shift: Int): DataFrame =
    curveFileStats(
      withScaledZ(
        df.select(col(a).cast("long").as("a"), col(b).cast("long").as("b")),
        "a", "b", "__z"),
      shift)
}
