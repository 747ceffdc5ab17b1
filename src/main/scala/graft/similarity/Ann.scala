package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (training-data-pipeline
  * extension; the reference exports vectors for external similarity
  * dedup — NewsDeduplication.scala:48-71 — our engine computes it
  * in-engine).
  *
  * Scale path: brute-force cosine is the correctness baseline
  * (O(Q·N), fine for a bounded query set against a broadcastable
  * corpus slice); random-hyperplane LSH bucketing makes the
  * candidate set an equi-join so the all-pairs product never
  * materializes at 100 TB.
  */
object Ann {

  /** Element arithmetic in double — float32 accumulation drifts and
    * is engine-dependent; double is exactly reproducible.
    */
  private def asDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Dot product via the native codegen expression
    * ([[graft.expressions.FloatDotProduct]]): participates in
    * whole-stage codegen and reads floats straight out of the unsafe
    * array representation. The equivalent higher-order-function form
    * runs interpreted per element and a Scala UDF pays a
    * Seq[Float] conversion per call — all three produce identical
    * doubles (same left-to-right IEEE accumulation).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(graft.expressions.FloatDotProduct(
      GraftShim.expression(a), GraftShim.expression(b)))
  }

  /** UDF form (kept for comparison benchmarks/specs). */
  private[graft] val dotUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var acc = 0d
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** Expression form (for engines/tests that need a UDF-free plan). */
  def dotExpr(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); the corpus
    * side streams. Deterministic: rounded score, id tiebreak.
    * Norms are computed once per vector before the pair join —
    * inside it they'd be recomputed per pair (O(Q·N) extra array
    * scans).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim d): integer-hash mapped to [-1, 1). Exactly reproducible in
    * any engine (pure integer arithmetic + one division).
    */
  def hyperplane(j: Int, d: Column): Column =
    (((d * 2654435761L + lit(j.toLong * 40503L + 17L)) % 1000L + 1000L) % 1000L)
      .cast("double") / 500.0 - 1.0

  /** Random-hyperplane LSH signature: bit j = sign(v · h_j), packed
    * into a long. Buckets with equal signatures are cosine-similar
    * candidates; join on the signature instead of crossing.
    */
  def rhpSignature(vecCol: Column, planes: Int): Column =
    rhpSigUdf(planes)(vecCol)

  /** Compiled kernel for the signature — bit-identical to
    * [[rhpSignatureExpr]] (same integer hash, same double ops in the
    * same order) but JIT-compiled instead of interpreted per element.
    */
  private def rhpSigUdf(planes: Int) = udf { (v: Seq[Float]) =>
    var sig = 0L
    var j = 0
    while (j < planes) {
      var acc = 0d
      var d = 0
      while (d < v.length) {
        val m = ((d.toLong * 2654435761L + (j.toLong * 40503L + 17L))
          % 1000L + 1000L) % 1000L
        acc += v(d).toDouble * (m.toDouble / 500.0 - 1.0)
        d += 1
      }
      if (acc > 0) sig += 1L << j
      j += 1
    }
    sig
  }

  /** Expression form of the signature (UDF-free plan). */
  def rhpSignatureExpr(vecCol: Column, planes: Int): Column =
    graft.ops.Exprs.bind(asDouble(vecCol)) { v =>
      (0 until planes).map { j =>
        val proj = aggregate(
          zip_with(v, sequence(lit(0L), size(v).cast("long") - 1L),
            (x, d) => x * hyperplane(j, d)),
          lit(0d), (acc, vv) => acc + vv)
        when(proj > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** LSH-bucketed ANN: candidates share a signature; exact cosine +
    * top-k only within buckets. Trades recall for never shuffling
    * the cross product.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      planes: Int, k: Int, roundTo: Int = 6): DataFrame = {
    // persisted: both self-join sides read signatures + norms
    val sig = corpus.select(col(idCol), col(vecCol),
      rhpSignature(col(vecCol), planes).as("sig"),
      norm(col(vecCol)).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.count() // materialize once — a lazy cache is raced (and thus
                // computed twice) by the two sides of the self-join
    val a = sig.select(col("sig"), col(idCol).as("query_id"),
      col(vecCol).as("qv"), col("nrm").as("qn"))
    val b = sig.select(col("sig"), col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col("nrm").as("cn"))
    val scored = a.join(b, "sig")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
