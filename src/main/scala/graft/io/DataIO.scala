package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch source/sink facade (SURVEY.md §2.1 S1-S13, S19; reference
  * DataLoader.scala:20-83 format-dispatch helpers plus the
  * per-format idioms spread across jobs).
  *
  * Everything routes through `DataFrameReader`/`DataFrameWriter`
  * so Catalyst owns the scan: column pruning and predicate pushdown
  * reach parquet/orc; explicit schemas (never inference) keep
  * production paths one-pass. The reference's MongoDB scans (S1/S2,
  * 32 MB `_id`-range partitions) are modeled as the partitioned
  * document-store JSONL reader — same contract (schema'd document
  * scan, parallel partitions), storage swapped for the zero-egress
  * environment.
  */
object DataIO {

  /** Dispatchable formats. XML is Spark 4's built-in source (pass
    * `rowTag`/`rootTag` via options). Avro's SQL module
    * (`spark-avro`) is a separate deploy-time artifact not present
    * in this environment — add "avro" here when it is on the
    * classpath; the dispatch needs no other change.
    */
  val formats: Set[String] =
    Set("parquet", "orc", "json", "csv", "text", "libsvm", "xml")

  /** Format-dispatched read (S19). `schema` skips inference — always
    * pass it in production paths (inference = an extra full scan for
    * json/csv).
    */
  def read(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(formats(format), s"unsupported format: $format")
    val r0: DataFrameReader = spark.read.format(format).options(options)
    val r = schema.fold(
      if (format == "csv" || format == "json")
        r0.option("inferSchema", "true") else r0
    )(r0.schema)
    r.load(path)
  }

  /** Partition-glob parquet read keeping partition columns (S3):
    * `basePath` + glob path, the reference's
    * `option("basePath", p).parquet(".../dt=2018-11-2[2-6]")`.
    */
  def readPartitioned(spark: SparkSession, basePath: String,
      glob: String): DataFrame =
    spark.read.option("basePath", basePath).parquet(glob)

  /** Format-dispatched write (S19). `coalesceTo` is the reference's
    * small-file control (X2) — prefer `maxRecordsPerFile` at scale,
    * coalesce only for single-digit output files.
    */
  def write(df: DataFrame, format: String, path: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil,
      coalesceTo: Option[Int] = None,
      options: Map[String, String] = Map.empty): Unit = {
    require(formats(format), s"unsupported format: $format")
    val d = coalesceTo.fold(df)(df.coalesce)
    val w = d.write.format(format).mode(mode).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
  }

  /** Delimited-text projection (S7 + P4): raw text lines split on a
    * separator, columns extracted by position with names — the
    * reference's `split(col("value"),"\t").getItem(i)` warehouse-
    * dump pattern, one codegen'd projection.
    */
  def readDelimited(spark: SparkSession, path: String, sep: String,
      columns: Seq[String]): DataFrame = {
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep))
    spark.read.text(path)
      .select(columns.zipWithIndex.map { case (name, i) =>
        parts.getItem(i).as(name)
      }: _*)
  }

  /** Whole-file read (S12): one row per file with its full content. */
  def readWholeText(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)

  /** Document-store scan (S1 contract): schema'd JSONL. The schema
    * is required — the reference's Mongo reader partitions by `_id`
    * ranges; here file splits give the same executor-side
    * parallelism.
    */
  def readDocStore(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Document-store sink (S2 contract): append-mode JSONL. */
  def writeDocStore(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).json(path)

  /** libsvm read with explicit feature count (S10,
    * NewsLDAModel.scala:25 `option("numFeatures","15984963")`).
    */
  def readLibsvm(spark: SparkSession, path: String,
      numFeatures: Long): DataFrame =
    spark.read.format("libsvm")
      .option("numFeatures", numFeatures.toString).load(path)
}
