package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-integer 8×8 DCT-II with JPEG-shape quantization — the lossy
  * transform-coding boundary the media pack stubbed until now
  * (reference exports media for external tooling; the r9 adjudication
  * keeps PERCEPTUAL entropy coding out of scope, but the transform +
  * quantizer itself is exact integer math and therefore fully
  * SQL-replayable, the G.711 pattern).
  *
  * Fixed-point basis: `M[u][x] = round(a(u)·cos((2x+1)uπ/16)·2¹³)`,
  * a(0)=√⅛, a(u>0)=½ — the orthonormal DCT matrix at scale 2¹³,
  * hardcoded as 64 literal longs so both engines read the SAME table
  * (no runtime cos). Forward coefficients land at scale 2²⁶
  * (`F = M·f·Mᵀ`); quantization divides by `q(u,v)·2²⁶` with
  * round-half-away-from-zero on the MAGNITUDE and the sign reapplied
  * (every integer division in the pipeline runs on a non-negative
  * numerator — the Trend.olsByGroup truncate-vs-floor contract);
  * dequantized integer coefficients drive the inverse
  * (`g = Mᵀ·F̂·M`, scale 2²⁶ again) and pixels reconstruct with the
  * same sign-guarded rounding, clamped to 0..255.
  *
  * Quality → table: the libjpeg rule, all integer —
  * sf = 5000/qf (qf<50) else 200−2·qf; q = clamp((Q50·sf+50)/100,
  * 1, 255).
  *
  * Magnitude contract (why every step fits a long): |f−128| ≤ 128 so
  * |F| ≤ 64·128·2¹³·2¹³ < 2⁴⁰; dequantized |coef| ≤ 2¹¹·255 < 2¹⁹;
  * inverse sums ≤ 64·2¹⁹·2²⁶ < 2⁵¹.
  *
  * Scale shape: the relational form is 64 basis rows broadcast twice
  * around a block-keyed aggregate — blocks never collide, so the
  * whole round-trip is embarrassingly parallel over blocks; the
  * compiled kernel does the same math per row for the hot path
  * (DctSpec pins kernel == relational == the SQL oracle's replay).
  */
object Dct {

  /** Scale of one basis factor (2¹³). */
  val Shift1 = 13
  /** Scale of a 2-factor product (2²⁶) and its half for rounding. */
  val Scale2: Long = 1L << 26
  val Half2: Long = 1L << 25

  /** round(a(u)·cos((2x+1)uπ/16)·8192) — row u, column x. */
  val Basis: Array[Array[Long]] = Array(
    Array(2896L, 2896L, 2896L, 2896L, 2896L, 2896L, 2896L, 2896L),
    Array(4017L, 3406L, 2276L, 799L, -799L, -2276L, -3406L, -4017L),
    Array(3784L, 1567L, -1567L, -3784L, -3784L, -1567L, 1567L, 3784L),
    Array(3406L, -799L, -4017L, -2276L, 2276L, 4017L, 799L, -3406L),
    Array(2896L, -2896L, -2896L, 2896L, 2896L, -2896L, -2896L, 2896L),
    Array(2276L, -4017L, 799L, 3406L, -3406L, -799L, 4017L, -2276L),
    Array(1567L, -3784L, 3784L, -1567L, -1567L, 3784L, -3784L, 1567L),
    Array(799L, -2276L, 3406L, -4017L, 4017L, -3406L, 2276L, -799L))

  /** The standard JPEG luminance quantization table (Annex K), row
    * major.
    */
  val Q50: Array[Long] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99).map(_.toLong)

  /** Quality-scaled quantization step for coefficient (u, v) — the
    * integer libjpeg rule.
    */
  def quantStep(u: Int, v: Int, quality: Int): Long = {
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val sf = if (quality < 50) 5000L / quality else 200L - 2L * quality
    val q = (Q50(u * 8 + v) * sf + 50L) / 100L
    math.max(1L, math.min(255L, q))
  }

  /** 64-row basis relation (u, x, c) for the relational twin. */
  def basisDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for (u <- 0 until 8; x <- 0 until 8)
      yield (u, x, Basis(u)(x))).toDF("u", "x", "c")
  }

  /** SQL literal of the basis as an inline VALUES relation — the
    * oracle reads the same 64 longs the kernel multiplies.
    */
  def basisSqlValues: String =
    (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u,$x,${Basis(u)(x)})").mkString(", ")

  /** SQL literal of the quality-scaled quant table (u, v, q). */
  def quantSqlValues(quality: Int): String =
    (for (u <- 0 until 8; v <- 0 until 8)
      yield s"($u,$v,${quantStep(u, v, quality)})").mkString(", ")

  /** Quantized code per coefficient, row-major 64 longs — the
    * forward DCT + sign-guarded round-half-away quantizer shared by
    * the round trip and the [[sizeBlock]] coding model.
    */
  private[graft] def quantCodes(px: Array[Long],
      quality: Int): Array[Long] = {
    require(px.length == 64, s"need 64 pixels, got ${px.length}")
    // forward: F[u][v] = Σ (p-128)·M[u][x]·M[v][y]   (scale 2^26)
    val f = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += (px(x * 8 + y) - 128L) * Basis(u)(x) * Basis(v)(y)
            y += 1
          }
          x += 1
        }
        f(u)(v) = s
        v += 1
      }
      u += 1
    }
    val out = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val d = quantStep(u, v, quality) * Scale2
        val a = math.abs(f(u)(v))
        val code = (a + d / 2) / d
        out(u * 8 + v) = if (f(u)(v) < 0) -code else code
        v += 1
      }
      u += 1
    }
    out
  }

  /** Compiled round-trip kernel over one row-major 64-long block:
    * returns (reconstructed block, nonzero quantized codes). Exact
    * integers end to end — DctSpec pins equality with the relational
    * form, the oracle replays the relational form in SQL.
    */
  private[graft] def roundTripBlock(px: Array[Long],
      quality: Int): (Array[Long], Int) = {
    val codes = quantCodes(px, quality)
    // dequantize to integer coefficients at scale 1
    val coef = Array.ofDim[Long](8, 8)
    var nnz = 0
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val code = codes(u * 8 + v)
        if (code != 0) nnz += 1
        coef(u)(v) = code * quantStep(u, v, quality)
        v += 1
      }
      u += 1
    }
    // inverse: g[x][y] = Σ coef·M[u][x]·M[v][y]   (scale 2^26)
    val out = new Array[Long](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0L
        var uu = 0
        while (uu < 8) {
          var vv = 0
          while (vv < 8) {
            s += coef(uu)(vv) * Basis(uu)(x) * Basis(vv)(y)
            vv += 1
          }
          uu += 1
        }
        val a = math.abs(s)
        val r = (a + Half2) / Scale2
        val p = (if (s < 0) -r else r) + 128L
        out(x * 8 + y) = math.max(0L, math.min(255L, p))
        y += 1
      }
      x += 1
    }
    (out, nnz)
  }

  /** The JPEG zigzag scan: position i → row-major coefficient
    * index. 64 literals (ISO 10918-1 Figure 5), shared verbatim
    * with the SQL twin via [[zigzagSqlValues]].
    */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** SQL literal (i, u, v) of the zigzag walk. */
  def zigzagSqlValues: String =
    Zigzag.zipWithIndex
      .map { case (rm, i) => s"($i,${rm / 8},${rm % 8})" }
      .mkString(", ")

  /** Coded-size model over one block's quantized codes — the
    * entropy-coding STAGE of JPEG with the Huffman table replaced
    * by fixed-width symbols, so the byte count is deterministic
    * and engine-replayable (the Huffman-optimal size is data-
    * dependent and not twin-verifiable; this model preserves the
    * structure that drives it — zigzag order, zero runs, magnitude
    * categories):
    *   DC:            4 + cat(code) bits   (size nibble + magnitude)
    *   each AC ≠ 0:   8 + cat(code) bits   (run/size byte + magnitude)
    *   each 16-zero run before an AC ≠ 0:  8 bits (ZRL)
    *   trailing zeros: 4 bits (EOB)
    * with cat(v) = bit length of |v| (0 for 0). Returns
    * (bits, nnz_ac).
    */
  private[graft] def sizeBlock(px: Array[Long],
      quality: Int): (Long, Int) = {
    val codes = quantCodes(px, quality)
    val dc = codes(Zigzag(0))
    var bits = 4L + cat(dc)
    var nnz = 0
    var run = 0
    var i = 1
    while (i < 64) {
      val c = codes(Zigzag(i))
      if (c == 0L) run += 1
      else {
        bits += 8L * (run / 16) + 8L + cat(c)
        nnz += 1
        run = 0
      }
      i += 1
    }
    if (run > 0) bits += 4L
    (bits, nnz)
  }

  private def cat(v: Long): Int =
    if (v == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(math.abs(v))

  /** Kernel UDF: block array → (bits, nnz_ac) of the size model. */
  def sizeUdf(quality: Int) = udf { (px: Seq[Long]) =>
    sizeBlock(px.toArray, quality)
  }

  /** Kernel UDF: block array → struct(recon array, nnz codes). */
  def roundTripUdf(quality: Int) = udf { (px: Seq[Long]) =>
    val (out, nnz) = roundTripBlock(px.toArray, quality)
    (out.toSeq, nnz)
  }

  /** Kernel UDF: block array → (max_abs_err, sse, nnz) of the round
    * trip — the per-block distortion/compression readout the q238
    * query aggregates.
    */
  def statsUdf(quality: Int) = udf { (px: Seq[Long]) =>
    val arr = px.toArray
    val (out, nnz) = roundTripBlock(arr, quality)
    var mx = 0L
    var sse = 0L
    var i = 0
    while (i < 64) {
      val e = math.abs(out(i) - arr(i))
      if (e > mx) mx = e
      sse += e * e
      i += 1
    }
    (mx, sse, nnz)
  }

  /** Relational round trip over (bCol, x, y, p) rows — one row per
    * pixel, blocks keyed by `bCol`. Returns (b, x, y, p, p2): the
    * spec's exactness twin for the kernel and the shape the SQL
    * oracle replays. Two broadcast joins against the 64-row basis
    * per pass; block-keyed aggregates only.
    */
  def roundTripRelational(pixels: DataFrame, bCol: String,
      quality: Int): DataFrame = {
    val spark = pixels.sparkSession
    import spark.implicits._
    val m1 = basisDf(spark).select(col("u").as("__u"),
      col("x").as("__bx"), col("c").as("__c1"))
    val m2 = basisDf(spark).select(col("u").as("__v"),
      col("x").as("__by"), col("c").as("__c2"))
    val qt = (for (u <- 0 until 8; v <- 0 until 8)
      yield (u, v, quantStep(u, v, quality)))
      .toDF("__u", "__v", "__q")
    val fwd = pixels
      .join(broadcast(m1), col("x") === col("__bx"))
      .join(broadcast(m2), col("y") === col("__by"))
      .groupBy(col(bCol), col("__u"), col("__v"))
      .agg(sum((col("p") - 128L) * col("__c1") * col("__c2")).as("__f"))
    val coef = fwd.join(broadcast(qt), Seq("__u", "__v"))
      .withColumn("__d", col("__q") * lit(Scale2))
      .withColumn("__code",
        signum(col("__f")).cast("long") *
          expr("(abs(__f) + __d div 2) div __d"))
      .select(col(bCol), col("__u"), col("__v"),
        (col("__code") * col("__q")).as("__cf"))
    val n1 = basisDf(spark).select(col("u").as("__u"),
      col("x").as("__px"), col("c").as("__c1"))
    val n2 = basisDf(spark).select(col("u").as("__v"),
      col("x").as("__py"), col("c").as("__c2"))
    val inv = coef
      .join(broadcast(n1), "__u")
      .join(broadcast(n2), "__v")
      .groupBy(col(bCol), col("__px").as("x"), col("__py").as("y"))
      .agg(sum(col("__cf") * col("__c1") * col("__c2")).as("__g"))
      .withColumn("p2",
        greatest(lit(0L), least(lit(255L),
          signum(col("__g")).cast("long") *
            expr(s"(abs(__g) + $Half2) div $Scale2") + 128L)))
      .select(col(bCol), col("x"), col("y"), col("p2"))
    pixels.join(inv, Seq(bCol, "x", "y"))
      .select(col(bCol), col("x"), col("y"), col("p"), col("p2"))
  }
}
