package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads go through
  * `spark.read.parquet` so Catalyst gets the full scan: column
  * pruning and predicate pushdown reach the parquet reader
  * (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    // vectorized reader rejects — read nanos as long and truncate) and
    // as plain TIMESTAMP(MICROS) without isAdjustedToUTC (which Spark
    // infers as TIMESTAMP_NTZ). Normalize every variant to session-TZ
    // TimestampType at microsecond precision — the session TZ is UTC
    // (GraftSession), so wall-clock values match what DuckDB reads
    // from the same file in every case.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType => // legacy nanos-as-long: truncate to micros
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => // naive micros: relabel as UTC instant
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }

  /** Register every table as a temp view so the SQL surface
    * (`spark.sql`) mirrors what the DuckDB oracle sees.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
