package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Cross-run incremental dedup registry — the corpus-registry shape
  * a continuously-ingesting pipeline needs: a persisted
  * (digest → first-seen keeper) table, bucketed on the digest
  * ([[graft.io.Bucketing]] machinery), that each NEW batch dedups
  * against WITHOUT rescanning historical text. First-seen wins:
  * a digest's keeper is the row that first ingested it (min id
  * within its founding batch), and later batches' copies drop —
  * replaying batches in order therefore equals a from-scratch dedup
  * of the union under the (batch_no, id) tie rule, which is what
  * RegistrySpec and the q237 oracle pin.
  *
  * Scale shape: the registry holds 16-byte digests + keeper ids —
  * the INDEX, never the corpus (at 100 TB of text the digest table
  * is ~0.01% of corpus bytes). A batch ingest pays: one batch-side
  * digest aggregate, one equi-join against the bucketed registry
  * (registry side exchange-free off the bucket layout; only the
  * batch — the small side by construction — shuffles to align),
  * and one bucket-aligned append of the new digests. History text
  * is never read again; the registry is never rewritten, only
  * appended (each append lays one file per bucket — the reader
  * keeps the exchange-free join; per-file sort metadata is
  * per-append, which bucketed scans tolerate).
  */
object Registry {

  /** Underscore-prefixed, so Spark's file-listing treats it as
    * metadata (like _SUCCESS) and never reads it as data. Its
    * presence marks "a graft registry created this directory", which
    * is what licenses the recursive delete on re-create.
    */
  private val Marker = "_graft_registry"

  private val SafeName = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Shared create-side guard (ADVICE r12): the table name is
    * interpolated into SQL, so restrict it to a safe identifier; the
    * recursive delete of `path` only proceeds when the directory is
    * absent, empty, or carries the [[Marker]] from a prior create —
    * a caller pointing at a directory of unrelated data gets an
    * error, not silent data loss. Leaves `path` existing, empty but
    * for the marker (the location must exist up front: scanning the
    * still-empty table — the first batch's anti-join — lists it).
    */
  private def prepareLocation(spark: SparkSession, name: String,
      path: String, family: String, buckets: Int): Unit = {
    require(SafeName.matches(name),
      s"registry name must match ${SafeName.regex}; got '$name'")
    require(!path.contains("'"),
      s"registry path must not contain a quote; got '$path'")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val entries = fs.listStatus(p)
      // _SUCCESS also licenses the clear: registries created before
      // the marker existed carry it from their insertInto appends
      // (and a Spark job OUTPUT is re-creatable by definition, unlike
      // arbitrary user data)
      require(entries.isEmpty ||
        fs.exists(new org.apache.hadoop.fs.Path(p, Marker)) ||
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
        s"refusing to clear '$path': non-empty and not a graft " +
          "registry (no marker file) — pass an empty or " +
          "registry-owned directory")
      // remove stale files from a previous registry at the same
      // path — saveAsTable Append would otherwise resurrect them
      fs.delete(p, true); ()
    }
    fs.mkdirs(p)
    // the marker carries (family, buckets) so [[attachTable]] can
    // validate instead of trusting the caller: attaching a NEAR
    // directory as an exact registry, or with a different bucket
    // count, would silently corrupt the layout contract
    val out = fs.create(new org.apache.hadoop.fs.Path(p, Marker))
    out.write(s"$family $buckets\n".getBytes("UTF-8"))
    out.close()
  }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(String, Int)] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(p, Marker))
    try {
      val content = scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim
      content.split("\\s+") match {
        case Array(f, b) if b.forall(_.isDigit) => Some((f, b.toInt))
        case _ => None // legacy empty marker (pre-stamp creates)
      }
    } finally in.close()
  }

  private val ExactDdl = "(h STRING, keep_id BIGINT, batch_no INT)"
  private val NearDdl = "(w INT, bucket BIGINT, doc_id BIGINT, simhash BIGINT)"
  private val VecDdl = "(sig BIGINT, vec_id BIGINT, embedding ARRAY<FLOAT>)"

  private def createTable(spark: SparkSession, name: String,
      path: String, buckets: Int, ddl: String, bucketCol: String): Unit = {
    spark.sql(
      s"""CREATE TABLE $name $ddl
         |USING parquet
         |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
         |INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    ()
  }

  /** ATTACH an existing registry into THIS session's catalog without
    * touching its data — the true cross-run entry: Spark's default
    * in-memory catalog forgets tables when the session ends, so a
    * later job (the next day's ingest) must re-register the table
    * over the surviving files. Requires the [[Marker]] a prior
    * create left (attaching a random directory is refused); the
    * `buckets` count MUST match the create (it is physical layout —
    * a mismatch silently breaks the exchange-free join, so record it
    * with the path). RegistrySpec pins attach-then-ingest equals
    * same-session continuation.
    */
  private def attachTable(spark: SparkSession, name: String,
      path: String, buckets: Int, ddl: String, bucketCol: String,
      family: String): Unit = {
    require(SafeName.matches(name),
      s"registry name must match ${SafeName.regex}; got '$name'")
    require(!path.contains("'"),
      s"registry path must not contain a quote; got '$path'")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(p, Marker)),
      s"'$path' is not a graft registry (no marker) — create() it first")
    // the create stamped (family, buckets) into the marker; a
    // mismatch means the caller is attaching the wrong registry or
    // breaking the physical bucket layout — both silent corruptions
    // without this check (legacy empty markers skip it)
    readMarker(fs, p).foreach { case (f, b) =>
      require(f == family && b == buckets,
        s"'$path' is a $f registry with $b buckets; " +
          s"attach requested $family/$buckets")
    }
    spark.sql(s"DROP TABLE IF EXISTS $name")
    createTable(spark, name, path, buckets, ddl, bucketCol)
  }

  /** Create or replace an EMPTY registry table `name` at `path`,
    * bucketed on the digest column `h`.
    */
  def create(spark: SparkSession, name: String, path: String,
      buckets: Int): Unit = {
    prepareLocation(spark, name, path, "exact", buckets)
    createTable(spark, name, path, buckets, ExactDdl, "h")
  }

  /** Whether `path` holds a graft registry (any family) — the
    * create-or-attach decision a scheduled ingest job makes.
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(p, Marker))
  }

  /** [[attachTable]] for the exact-digest registry. */
  def attach(spark: SparkSession, name: String, path: String,
      buckets: Int): Unit =
    attachTable(spark, name, path, buckets, ExactDdl, "h", "exact")

  /** [[attachTable]] for the near-dup registry. */
  def attachNear(spark: SparkSession, name: String, path: String,
      buckets: Int): Unit =
    attachTable(spark, name, path, buckets, NearDdl, "bucket", "near")

  /** [[attachTable]] for the vector registry. */
  def attachVec(spark: SparkSession, name: String, path: String,
      buckets: Int): Unit =
    attachTable(spark, name, path, buckets, VecDdl, "sig", "vec")

  /** The batch rows that survive against the current registry:
    * digests never seen before, one keeper per digest (min id
    * WITHIN the batch). Pure read — [[ingest]] is the mutating
    * form. Returns (h, keep_id).
    */
  def dedupBatch(spark: SparkSession, name: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val fresh = batch
      .select(col(idCol).cast("long").as("keep_id"),
        TextFunctions.contentHash(col(textCol)).as("h"))
      .groupBy(col("h"))
      .agg(min(col("keep_id")).as("keep_id"))
    fresh.join(spark.table(name).select(col("h")), Seq("h"), "left_anti")
  }

  /** Ingest one batch: append its surviving digests (tagged
    * `batchNo`) to the registry and return them. Idempotent at the
    * DIGEST level — re-ingesting an already-registered batch
    * appends nothing and returns zero rows.
    */
  def ingest(spark: SparkSession, name: String, batch: DataFrame,
      idCol: String, textCol: String, batchNo: Int): DataFrame =
    ingestDigests(spark, name,
      batch.select(col(idCol).cast("long").as("keep_id"),
          TextFunctions.contentHash(col(textCol)).as("h"))
        .groupBy(col("h")).agg(min(col("keep_id")).as("keep_id")),
      batchNo)

  /** [[ingest]] over PRECOMPUTED batch digests — `digests` must be
    * (h, keep_id), one row per digest (the batch's min-id
    * representative). This is the entry a single-scan pipeline uses
    * ([[graft.pipeline.Pipelines.ingestBatch]]): the caller derives
    * every text-dependent column in one projection and each registry
    * stage consumes its slice without re-reading the text.
    */
  def ingestDigests(spark: SparkSession, name: String,
      digests: DataFrame, batchNo: Int): DataFrame = {
    // NULL digests (md5 of a NULL text) are excluded WHOLE: a null
    // key never matches the anti-join, so without this filter every
    // batch would re-append its null-text rows as "fresh" forever —
    // the same join-null-semantics hazard as the Concurrency r12 fix
    val nonNull = digests.filter(col("h").isNotNull)
    // the survivor set must be pinned BEFORE the append, and plain
    // persist() is NOT enough: the insert refreshes the table by
    // path, which invalidates every cached plan referencing it —
    // including the survivors, which would lazily recompute against
    // the just-updated registry and vanish. localCheckpoint severs
    // the lineage (the plan becomes an RDD scan with no table
    // reference), so the refresh cannot touch it.
    val kept = nonNull
      .join(spark.table(name).select(col("h")), Seq("h"), "left_anti")
      .withColumn("batch_no", lit(batchNo))
      .select(col("h"), col("keep_id"), col("batch_no"))
      .localCheckpoint()
    // insertInto keeps the table's bucket spec: rows hash to their
    // bucket files on write, so the layout contract survives appends
    kept.write.mode(SaveMode.Append).insertInto(name)
    kept
  }

  /** Compact a registry table back to ONE file per bucket — the
    * small-files cure for the append-only ingest path. Every
    * [[ingest]]/[[nearIngest]]/[[vecIngest]] append lays one file
    * per bucket, so after 10³ ingests a bucketed scan opens 10³
    * files per bucket: same bytes, three orders of magnitude more
    * opens/footers/scheduler tasks — the classic small-files cliff.
    * Compaction rewrites the SAME rows in the SAME bucket layout
    * (first-seen keepers preserved verbatim — this is a file-layout
    * operation, not a dedup pass), so probe plans before and after
    * are identical and the exchange-free join contract survives;
    * only the file count changes. Works for all three registry
    * families — pass the table's bucket column (`h`, `bucket`,
    * `sig`) and its bucket count.
    *
    * Run it out-of-band (the compaction window a nightly table
    * service owns): one scan + one hash exchange on the bucket
    * column + one write of the registry — O(registry), never
    * O(corpus), and the registry is the ~0.01%-of-corpus index.
    *
    * localCheckpoint before the overwrite for the same
    * refresh-by-path reason as [[ingest]], made HARDER here by
    * Overwrite mode: the insert truncates the table first, so a
    * lazy plan would re-read an empty (or half-written) directory —
    * the read must be fully materialized off the old files before
    * the first delete. The repartition keys rows by the same
    * hash(bucketCol) % buckets the bucket spec uses, so each of the
    * `buckets` write tasks holds exactly one bucket's rows and lays
    * exactly one file.
    */
  def compact(spark: SparkSession, name: String, bucketCol: String,
      buckets: Int): Unit = {
    val pinned = spark.table(name).localCheckpoint()
    pinned.repartition(buckets, col(bucketCol))
      .write.mode(SaveMode.Overwrite).insertInto(name)
    pinned.unpersist()
    ()
  }

  // ---- near-duplicate registry (SimHash-banded) ----

  /** Create or replace an EMPTY near-dup registry: one row per
    * (window, doc) — `w` the 15-bit simhash window index, `bucket`
    * that window's value — bucketed on the bucket key so ingest
    * probes join the stored side exchange-free.
    */
  def createNear(spark: SparkSession, name: String, path: String,
      buckets: Int): Unit = {
    prepareLocation(spark, name, path, "near", buckets)
    createTable(spark, name, path, buckets, NearDdl, "bucket")
  }

  /** The (w, bucket) window keys of a simhash — window t is the
    * 15-bit slice at bits [60−15(t+1), 60−15t), the
    * [[Dedup.bandedHammingPairs]] convention.
    */
  private def windowKeys(df: DataFrame, tables: Int): DataFrame =
    df.select(col("doc_id"), col("simhash"),
        explode(array((0 until tables).map(t => struct(
          lit(t).as("w"),
          shiftright(col("simhash"), 60 - 15 * (t + 1))
            .bitwiseAND(lit(32767L)).as("bucket"))): _*)).as("__wb"))
      .select(col("__wb.w").as("w"), col("__wb.bucket").as("bucket"),
        col("doc_id"), col("simhash"))

  /** Ingest one batch against the near-dup registry: a batch doc
    * survives iff (a) it is its simhash's min-id representative
    * within the batch (identical-simhash collapse — within-batch
    * NEAR pairs with distinct simhashes land together by documented
    * contract and are the next corpus pass's job), and (b) NO
    * registered doc shares a 15-bit window AND sits within
    * `maxHamming` (the banded-candidate match rule of
    * [[Dedup.bandedHammingPairs]]: recall total below `tables`
    * differing bits, the standard multi-table trade above). History
    * TEXT is never read — 60-bit signatures are the whole state,
    * ~16 bytes per registered doc per window. Survivors' window
    * rows append bucket-aligned; returns (doc_id, simhash).
    */
  def nearIngest(spark: SparkSession, name: String, batch: DataFrame,
      idCol: String, textCol: String, tables: Int = 2,
      maxHamming: Int = 20): DataFrame =
    nearIngestSims(spark, name,
      batch.select(Dedup.simhash60(
          graft.text.TextFunctions.tokens(col(textCol))).as("simhash"),
        col(idCol).cast("long").as("doc_id")),
      tables, maxHamming)

  /** [[nearIngest]] over PRECOMPUTED signatures — `sims` must be
    * (doc_id, simhash), one row per batch doc (duplicates by doc id
    * are the caller's bug). Same single-scan rationale as
    * [[ingestDigests]].
    */
  def nearIngestSims(spark: SparkSession, name: String,
      sims: DataFrame, tables: Int = 2, maxHamming: Int = 20): DataFrame = {
    val reps = sims
      .groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val probes = windowKeys(reps, tables)
    val matched = probes
      .join(spark.table(name)
          .select(col("w"), col("bucket"), col("simhash").as("__rs")),
        Seq("w", "bucket"))
      .filter(Dedup.hammingDist(col("simhash"), col("__rs"))
        <= maxHamming)
      .select(col("doc_id")).distinct()
    // pinned before the append — same refresh-by-path hazard as
    // [[ingest]], same localCheckpoint cure
    val kept = reps.join(matched, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("simhash"))
      .localCheckpoint()
    windowKeys(kept, tables)
      .select(col("w"), col("bucket"), col("doc_id"), col("simhash"))
      .write.mode(SaveMode.Append).insertInto(name)
    kept
  }

  // ---- embedding near-duplicate registry (RHP-bucketed) ----

  /** Create or replace an EMPTY vector registry: one row per
    * registered vector, keyed by its random-hyperplane signature —
    * bucketed on the signature so ingest probes join the stored
    * side exchange-free.
    */
  def createVec(spark: SparkSession, name: String, path: String,
      buckets: Int): Unit = {
    prepareLocation(spark, name, path, "vec", buckets)
    createTable(spark, name, path, buckets, VecDdl, "sig")
  }

  /** Ingest one batch of vectors: a vector survives iff (a) it is
    * its exact embedding's min-id representative within the batch,
    * and (b) NO registered vector shares its RHP signature with
    * rounded cosine ≥ `threshold` (the [[graft.similarity.Ann
    * .lshDupPairs]] rule: exact re-ingested copies share the
    * signature by construction, so recall on true duplicates is
    * total; near-but-rotated vectors follow the standard LSH
    * trade). The registry holds (sig, id, embedding) — at vector
    * corpora the embedding IS the signature payload, and probe
    * candidates are signature-bucket-bounded, never all-pairs.
    * Third member of the registry family: exact digests ([[ingest]]),
    * text SimHash windows ([[nearIngest]]), vectors here — one
    * O(batch) ingest contract across modalities.
    *
    * SIZE `planes` TO THE CORPUS — the O(batch) contract holds only
    * while signature buckets stay bounded: expected candidates per
    * probe ≈ registry_rows / 2^planes, so ingest cost grows
    * LINEARLY with the registry once 2^planes is small against it.
    * Measured (PERF.md r13): at planes=8 (256 buckets) a 5k-vector
    * ingest degraded 4.3 s → 137 s as the registry grew 5k → 510k;
    * at planes=16 the same sweep is flat. Rule: planes ≳
    * log2(expected corpus) + a few bits of slack — and it is FROZEN
    * at create time (the stored sig encodes it), so size for the
    * corpus you'll have, not the one you start with. Exact
    * duplicates share the signature at ANY planes (identical input
    * → identical hyperplane signs), so raising planes never costs
    * recall on true copies — only on near-but-rotated vectors, the
    * standard LSH trade.
    */
  def vecIngest(spark: SparkSession, name: String, batch: DataFrame,
      idCol: String, vecCol: String, planes: Int = 16,
      threshold: Double = 0.99, roundTo: Int = 6): DataFrame = {
    import graft.similarity.Ann
    // NULL embeddings are excluded WHOLE (documented convention):
    // they carry no signature — the RHP kernel has nothing to hash —
    // and a null signature key would dodge every probe join forever
    // (the ingestDigests null-h hazard in vector form)
    val reps = batch.filter(col(vecCol).isNotNull)
      .groupBy(col(vecCol).as("embedding"))
      .agg(min(col(idCol).cast("long")).as("vec_id"))
      .select(col("vec_id"), col("embedding"),
        Ann.rhpSignature(col("embedding"), planes).as("sig"))
    val matched = reps
      .join(spark.table(name)
          .select(col("sig"), col("embedding").as("__rv")),
        Seq("sig"))
      .filter(round(Ann.dot(col("embedding"), col("__rv")) /
        (Ann.norm(col("embedding")) * Ann.norm(col("__rv"))), roundTo)
        >= threshold)
      .select(col("vec_id")).distinct()
    // same refresh-by-path hazard, same localCheckpoint cure
    val kept = reps.join(matched, Seq("vec_id"), "left_anti")
      .select(col("sig"), col("vec_id"), col("embedding"))
      .localCheckpoint()
    kept.write.mode(SaveMode.Append).insertInto(name)
    kept.select(col("vec_id"), col("sig"))
  }
}
