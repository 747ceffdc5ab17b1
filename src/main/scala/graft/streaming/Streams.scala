package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming module (SURVEY.md §2.1 S14-S18, §2.11;
  * reference DataLoader.scala:96-253 source/sink wrappers).
  *
  * The reference's streaming surface is ingestion plumbing only —
  * no watermarks or stateful operators. We reproduce its source/sink
  * matrix and add the event-time layer a modern engine needs
  * (declared extension per SURVEY §2.11): watermarked tumbling/
  * sliding windows and timeout-based sessionization. All operators
  * are incremental: state lives in the state store keyed by
  * group/window, scales horizontally with shuffle partitions, and
  * late data past the watermark is dropped deterministically.
  */
object Streams {

  // ---- sources (S14, S15) ----

  def socketSource(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Kafka source with the reference's options
    * (DataLoader.scala:118-131): key/value cast to string.
    */
  def kafkaSource(spark: SparkSession, brokers: String, subscribe: String,
      startingOffsets: String = "latest", minPartitions: Option[Int] = None,
      failOnDataLoss: Boolean = false): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", subscribe)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
    minPartitions.foreach(n => r.option("minPartitions", n.toString))
    r.load().selectExpr("CAST(key AS STRING) AS key",
      "CAST(value AS STRING) AS value", "topic", "partition", "offset",
      "timestamp")
  }

  // ---- sinks (S16, S17, S18) ----

  def memorySink(df: DataFrame, queryName: String,
      outputMode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream.format("memory").queryName(queryName)
      .outputMode(outputMode).start()

  def consoleSink(df: DataFrame, outputMode: OutputMode = OutputMode.Append(),
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    df.writeStream.format("console").outputMode(outputMode)
      .trigger(trigger).start()

  /** Streaming parquet sink (S17): checkpointed, optionally
    * partitioned, processing-time trigger.
    */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
      partitionBy: Seq[String] = Nil,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val w = df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .trigger(trigger)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** Kafka sink (S18): requires (key, value) string columns. */
  def kafkaSink(df: DataFrame, brokers: String, topic: String,
      checkpoint: String): StreamingQuery =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()

  /** foreachBatch sink: hands each micro-batch to arbitrary batch
    * logic (idempotent merges, multi-sink fan-out, JDBC upserts —
    * the sink shapes the built-in formats can't express). The
    * batchId makes the handler replay-safe: a batch re-delivered
    * after a failure arrives with the same id.
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))(
      handler: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(handler)
      .start()

  // ---- event-time layer (declared extension) ----

  /** Watermarked tumbling (or sliding, when `slide` is set) window
    * aggregation: count + sum(value) per (window, keys).
    */
  def windowedAgg(events: DataFrame, tsCol: String, valueCol: String,
      watermark: String, windowDur: String, slide: Option[String] = None,
      keys: Seq[String] = Nil): DataFrame = {
    val win = slide.fold(window(col(tsCol), windowDur))(s =>
      window(col(tsCol), windowDur, s))
    events.withWatermark(tsCol, watermark)
      .groupBy(win +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(Seq(col("window.start").as("win_start"),
        col("window.end").as("win_end")) ++ keys.map(col) ++
        Seq(col("n"), col("total")): _*)
  }

  /** Streaming exact dedup on a key (the streaming form of the batch
    * dropDuplicates dedup, M11): keeps the FIRST arrival of each
    * `keyCols` combination. With `withinWatermark` the per-key state
    * expires once the watermark passes — bounded state, the only form
    * that survives an unbounded stream; duplicates farther apart in
    * event time than the watermark delay can then reappear, which is
    * the standard trade. Without it state grows with distinct keys
    * (exact forever, bounded corpus only).
    */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String], withinWatermark: Boolean = true): DataFrame = {
    val wm = events.withWatermark(tsCol, watermark)
    if (withinWatermark) wm.dropDuplicatesWithinWatermark(keyCols)
    else wm.dropDuplicates(keyCols)
  }

  /** Stream-stream interval join (§2.11 extension): left row at time
    * tL matches right rows of the same key with tR in
    * [tL - before, tL + after]. Both sides carry the watermark, so
    * the join state expires deterministically — without the time
    * bound a stream-stream join would buffer both streams forever.
    * Column contract: both sides carry `keyCol`; the two event-time
    * columns must have different names (they both appear qualified
    * in the join condition).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, watermark: String,
      before: String, after: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $before") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $after"))
      .drop(col(s"r.$keyCol"))
  }

  // ---- stateful sessionization (mapGroupsWithState) ----

  case class Event(userId: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Int, total: Double)
  case class Session(userId: Long, startMs: Long, endMs: Long, n: Int,
    total: Double)

  /** Event-time sessionization: events for a user belong to one
    * session until `gapMs` of event-time silence. A session is
    * emitted when the watermark passes its end + gap — fully
    * deterministic in event time (a processing-time timeout would
    * re-trigger micro-batches on the wall clock and make results
    * run-dependent). State is per-user in the state store —
    * O(active users), not O(events).
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.end, s.n, s.total))
          } else {
            val batch = rows.toSeq
            val tsMin = batch.map(_.ts.getTime).min
            val tsMax = batch.map(_.ts.getTime).max
            val cur = state.getOption.getOrElse(SessionState(tsMin, tsMax, 0, 0d))
            val merged = SessionState(
              math.min(cur.start, tsMin), math.max(cur.end, tsMax),
              cur.n + batch.size, cur.total + batch.map(_.value).sum)
            state.update(merged)
            // close when the watermark passes the last event + gap
            state.setTimeoutTimestamp(merged.end + gapMs)
            Iterator.empty
          }
      }
  }

  // ---- stateful streaming near-dedup ----

  case class SimDoc(docId: Long, ts: java.sql.Timestamp, simhash: Long)
  case class DedupDecision(docId: Long, isDup: Boolean, nearId: Long)

  /** Streaming NEAR-duplicate detection: documents are keyed by the
    * 15-bit SimHash prefix bucket (the same single-table bucketing as
    * the batch near-pair search), and each bucket keeps the last
    * `maxPerBucket` (simhash, docId) pairs as state. A new document
    * is flagged a near-dup when any retained simhash in its bucket is
    * within `maxHamming`; `nearId` is the earliest such match (-1
    * when unique). Emitted per arrival in Append mode, deterministic
    * within a batch (group rows processed in (ts, docId) order).
    *
    * State is doubly bounded — the only thing that matters on an
    * unbounded stream: per-bucket entries cap at `maxPerBucket`
    * (oldest evicted first), and idle buckets expire wholesale when
    * the watermark passes their last arrival + `idleMs`. The
    * single-prefix recall trade vs the batch multiprobe search
    * ([[graft.dedup.Dedup.simhashNearPairs]]) is the standard
    * streaming compromise: one stateful operator, no second shuffle.
    */
  def nearDedupStream(docs: Dataset[SimDoc], maxHamming: Int,
      idleMs: Long, watermarkDelay: String = "0 seconds",
      maxPerBucket: Int = 128): Dataset[DedupDecision] = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", watermarkDelay)
      .groupByKey(d => d.simhash >>> 45)
      .flatMapGroupsWithState[List[(Long, Long)], DedupDecision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[SimDoc],
            state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val batch = rows.toSeq.sortBy(d => (d.ts.getTime, d.docId))
            val out = batch.map { d =>
              val hit = seen.reverseIterator.find { case (sh, _) =>
                java.lang.Long.bitCount(sh ^ d.simhash) <= maxHamming
              }
              seen = ((d.simhash, d.docId) :: seen).take(maxPerBucket)
              DedupDecision(d.docId, hit.isDefined,
                hit.map(_._2).getOrElse(-1L))
            }
            state.update(seen)
            state.setTimeoutTimestamp(
              batch.map(_.ts.getTime).max + idleMs)
            out.iterator
          }
      }
  }

  // ---- stateful streaming passage-reuse detection ----

  case class FpArrival(docId: Long, ts: java.sql.Timestamp, fp: Long)
  case class FpNovelty(fp: Long, docId: Long, isNew: Boolean, firstId: Long)

  /** Streaming passage-reuse detection — the ingestion twin of
    * [[graft.text.Winnow.sharedFingerprintPairs]]: arriving documents
    * are exploded to (docId, ts, fingerprint) rows batch-side
    * (`explode(Winnow.fingerprintsFast(text))` — a stateless map),
    * and THIS operator keys by fingerprint and remembers the first
    * document that carried it. Each arrival is emitted with
    * `isNew` (fingerprint never seen inside the state horizon) and
    * `firstId` (the document that introduced it; the arrival's own
    * id when new). A document whose arrivals are mostly `isNew =
    * false` is passage-level duplicated; aggregate per docId
    * downstream (foreachBatch, or a batch pass over the sink).
    *
    * State is one (first docId) per fingerprint active inside the
    * watermark + `idleMs` horizon — the streaming compromise vs the
    * batch pair join, which sees all history. Idle fingerprints
    * expire wholesale via the event-time timeout, so state tracks
    * the recent-passage working set, not the corpus. Deterministic
    * within a batch: group rows are processed in (ts, docId) order.
    */
  def passageNoveltyStream(fps: Dataset[FpArrival], idleMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[FpNovelty] = {
    import fps.sparkSession.implicits._
    fps.withWatermark("ts", watermarkDelay)
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Long, FpNovelty](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (fp: Long, rows: Iterator[FpArrival], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(d => (d.ts.getTime, d.docId))
            var first = state.getOption.getOrElse(-1L)
            val out = batch.map { d =>
              val isNew = first == -1L
              if (isNew) first = d.docId
              FpNovelty(fp, d.docId, isNew, first)
            }
            state.update(first)
            state.setTimeoutTimestamp(batch.map(_.ts.getTime).max + idleMs)
            out.iterator
          }
      }
  }

  /** Stream-static dimension enrichment: join an unbounded stream
    * against a bounded dimension table. Stateless — the static side
    * broadcasts to every task and each micro-batch joins map-side,
    * so there is no state store, no watermark requirement, and no
    * shuffle of the stream. The streaming twin of q05's star-join
    * dimension legs; for a dimension too big to broadcast, drop the
    * hint and each micro-batch runs a shuffle join instead.
    */
  def enrich(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Streaming curation chain — the ingestion form of
    * [[graft.pipeline.Pipelines.curate]]: quality gate → watermarked
    * exact dedup on the content digest → PII redaction, as one
    * readStream→writeStream pipeline.
    *
    * Scale shape: the quality filter and the redaction are map-side
    * column expressions fused into the scan (no state, no shuffle);
    * the ONLY stateful operator is the digest dedup, whose state is
    * 16-byte digests bounded by the watermark horizon
    * ([[dedupStream]]'s contract). Near-dup detection on a stream is
    * [[nearDedupStream]]; chain it on the survivors when needed.
    */
  def curateStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String, minChars: Int = 100): DataFrame = {
    val gated = docs
      .filter(length(col(textCol)) >= minChars)
      .withColumn("__digest", md5(col(textCol)))
    dedupStream(gated, tsCol, watermark, Seq("__digest"))
      // the full 4-class chain (email, NANP, short phone, IPv4) —
      // same ordered passes the batch q153 verifies against DuckDB
      .withColumn(textCol, graft.text.Redact.redactAll(col(textCol)))
      .drop("__digest")
  }

  /** Streaming boilerplate paragraph filter — the ingestion form of
    * [[graft.dedup.Dedup.stripHotParagraphs]] in the standard lambda
    * shape: the hot set is computed OFFLINE by a batch pass over the
    * historical corpus ([[graft.dedup.Dedup.hotParagraphDigests]],
    * re-run on whatever cadence boilerplate drifts), and every
    * arriving document is scrubbed against it map-side. Stateless —
    * the digest list rides one broadcast row through a stream-static
    * equi-join; no state store, no watermark, no shuffle of the
    * stream. `textCol` is replaced by the cleaned text; (n_paras,
    * n_removed) are appended for monitoring.
    */
  def stripBoilerplateStream(docs: DataFrame, textCol: String,
      hotDigests: DataFrame, sep: String = "\n"): DataFrame =
    graft.dedup.Dedup.stripParagraphsByDigest(docs, textCol, hotDigests, sep)

  /** Stateless streaming NB classification — the model-apply-at-
    * ingestion shape. The model is fitted OFFLINE by a batch pass
    * ([[graft.feature.NaiveBayes.fitCompact]], refit on whatever
    * cadence drift demands — the boilerplate-hot-set lambda pattern)
    * and rides the task closure as a bounded broadcast artifact;
    * every arriving document is tokenized and scored map-side. No
    * state store, no watermark, no shuffle of the stream. Docs with
    * zero in-model tokens keep a null `pred` (scorable-coverage is a
    * monitoring concern, not a drop rule). Scores equal the batch
    * [[graft.feature.NaiveBayes.classify]] exactly (spec-pinned).
    */
  def classifyStream(docs: DataFrame, textCol: String,
      model: graft.feature.NaiveBayes.CompactModel): DataFrame = {
    val scoreUdf = udf { (text: String) =>
      model.score(
        if (text == null) Seq.empty[String] else text.split(" ", -1).toSeq)
    }
    docs.withColumn("__nb", scoreUdf(col(textCol)))
      .withColumn("pred", col("__nb._1"))
      .withColumn("score_fx", col("__nb._2"))
      .drop("__nb")
  }

  /** Streaming change detection against the last snapshot — CDC at
    * ingestion, the stream twin of [[graft.ops.Snapshots.diff]].
    * The baseline is the OFFLINE (id, digest) reduction of the
    * previous snapshot ([[graft.ops.Snapshots.digests]], ~50
    * bytes/doc — the lambda-pattern artifact like the boilerplate
    * hot set and the compact NB model); each arriving doc digests
    * map-side and left-joins it: `added` (id unseen), `changed`
    * (digest differs), `unchanged`. Stateless — no state store, no
    * watermark; `removed` is unobservable on a stream by nature
    * (absence never arrives) and stays a batch-diff concern.
    */
  def snapshotDiffStream(docs: DataFrame, idCol: String, textCol: String,
      baselineDigests: DataFrame): DataFrame =
    docs.withColumn("__d2", md5(col(textCol)))
      .join(baselineDigests
        .select(col(idCol), col("digest").as("__d1")), Seq(idCol), "left")
      .withColumn("status",
        when(col("__d1").isNull, "added")
          .when(col("__d1") === col("__d2"), "unchanged")
          .otherwise("changed"))
      .drop("__d1", "__d2")

  /** Streaming distribution-drift monitor — the stream twin of
    * [[graft.ops.Profiler.chiSquareDrift]] (q171). The reference
    * reduces OFFLINE to its bounded histogram artifact
    * ([[graft.ops.Profiler.referenceHistogram]], ≤B rows — the same
    * bounded-offline-artifact pattern as the compact NB model and
    * the benchmark digest set), and each micro-batch scores against
    * it at per-batch cost via `foreachBatch`: the reference is never
    * re-scanned. The handler receives (drift table, batchId) — route
    * it to an alert sink or a metrics table; twin equality with the
    * batch operator is spec-pinned (StreamsSpec).
    */
  def driftMonitorStream(events: DataFrame, valCol: String,
      refHist: DataFrame, buckets: Int, checkpoint: String)(
      handler: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        handler(
          graft.ops.Profiler.driftAgainst(refHist, batch, valCol, buckets),
          id)
      }
      .start()

  /** [[driftMonitorStream]]'s PSI sibling: the same per-batch
    * contract (reference never rescans, only the micro-batch does)
    * with [[graft.ops.Profiler.psiAgainst]]'s log-ratio term —
    * batch/stream parity is already spec-pinned at the Profiler
    * level (shared term expression).
    */
  def psiMonitorStream(events: DataFrame, valCol: String,
      refHist: DataFrame, buckets: Int, checkpoint: String)(
      handler: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        handler(
          graft.ops.Profiler.psiAgainst(refHist, batch, valCol, buckets),
          id)
      }
      .start()

  /** Epoch-namespaced registry batch number for a micro-batch (r14
    * ADVICE #5): raw `id.toInt` collides across checkpoint lineages —
    * a stream restarted with a FRESH checkpoint (or a second stream
    * sharing the registry) restarts ids at 0, and the replay
    * contract would treat its genuinely new batches as replays of
    * the first lineage's (probes exclude those rows ⇒ duplicates
    * re-admitted). [[graft.dedup.Registry.streamEpochBase]] binds
    * each checkpoint lineage to a disjoint epoch; the same
    * checkpoint (a restart/replay) keeps its numbers. Anchored at
    * ONE registry per stream — for the chained ingest that anchor
    * is the exact registry, and its member registries must not be
    * shared with differently-anchored streams (documented there).
    */
  private def epochBatchNo(spark: org.apache.spark.sql.SparkSession,
      registryName: String, checkpoint: String, id: Long): Int =
    graft.dedup.Registry.streamBatchNo(
      graft.dedup.Registry.streamEpochBase(spark, registryName,
        checkpoint), id)

  /** Streaming dedup-registry maintenance — [[graft.dedup
    * .Registry]]'s ingestion twin: each micro-batch dedups against
    * the persisted digest registry (anti-join whose stored side
    * reads exchange-free off the bucket layout) and appends ONLY
    * its own new digests, tagged with the batch id. The registry
    * table IS the state — append-only, no versioned copies — so
    * per-batch cost is O(batch) and history text is never
    * rescanned. First-seen-wins across the whole stream: replaying
    * the batches equals a from-scratch dedup of their union under
    * the (batch_no, id) tie rule (StreamsSpec pins it). The
    * optional handler receives each batch's survivors.
    */
  def registryMaintStream(docs: DataFrame, idCol: String,
      textCol: String, registryName: String, checkpoint: String)(
      handler: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        handler(graft.dedup.Registry.ingest(s, registryName, batch,
          idCol, textCol,
          epochBatchNo(s, registryName, checkpoint, id)), id)
      }
      .start()

  /** Streaming count-min maintenance — [[graft.ops.CountMin]]'s
    * ingestion twin: each micro-batch sketches ONLY its own rows and
    * merges counter-wise with the prior version (the d·w-bounded
    * mergeable monoid; merge == sketch-of-union is spec-pinned in
    * CountMinSpec), so the stream is never rescanned and state stays
    * d·w rows regardless of stream length. Frequency estimates read
    * off the maintained sketch at any point via
    * [[graft.ops.CountMin.estimate]]. StreamsSpec pins maintained ==
    * from-scratch over the batches' union.
    */
  def cmsMaintStream(events: DataFrame, keyCol: String, d: Int,
      w: Int, stateDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        maintainVersioned(stateDir, id,
          graft.ops.CountMin.sketch(batch, keyCol, d, w))(
          (prior, fresh) => graft.ops.CountMin.merge(prior, fresh))
      }
      .start()

  /** [[registryMaintStream]]'s NEAR-dup sibling: each micro-batch
    * runs [[graft.dedup.Registry.nearIngest]] against the SimHash
    * window registry — O(batch) per batch, signatures are the whole
    * state, history text never rescanned. First-seen-wins across
    * the stream (StreamsSpec pins the q241 survivor chain).
    */
  def nearRegistryMaintStream(docs: DataFrame, idCol: String,
      textCol: String, registryName: String, checkpoint: String)(
      handler: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        handler(graft.dedup.Registry.nearIngest(s, registryName, batch,
          idCol, textCol,
          epochBatchNo(s, registryName, checkpoint, id)), id)
      }
      .start()

  /** [[registryMaintStream]]'s VECTOR sibling: each micro-batch runs
    * [[graft.dedup.Registry.vecIngest]] against the RHP-signature
    * registry — the q242 contract driven by a stream.
    */
  def vecRegistryMaintStream(vecs: DataFrame, idCol: String,
      vecCol: String, registryName: String, checkpoint: String)(
      handler: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        handler(graft.dedup.Registry.vecIngest(s, registryName, batch,
          idCol, vecCol,
          epochBatchNo(s, registryName, checkpoint, id)), id)
      }
      .start()

  /** [[registryMaintStream]]'s MINHASH sibling: each micro-batch
    * runs [[graft.dedup.Registry.minhashIngest]] against the
    * band-bucketed signature registry — the q249 Jaccard lane driven
    * by a stream, micro-batch ids as batch numbers (replay-safe like
    * the rest of the family).
    */
  def minhashRegistryMaintStream(docs: DataFrame, idCol: String,
      textCol: String, registryName: String, checkpoint: String)(
      handler: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        handler(graft.dedup.Registry.minhashIngest(s, registryName,
          batch, idCol, textCol,
          epochBatchNo(s, registryName, checkpoint, id)), id)
      }
      .start()

  /** The FULL incremental-curate chain as an ingestion stream — the
    * per-modality maintenance streams above composed the way a
    * production feed runs them: each micro-batch flows through
    * [[graft.pipeline.Pipelines.ingestBatch]] (quality → exact
    * registry → near registry → optional vector registry → n-gram
    * decontam), batch text scanned once, history never; the handler
    * receives the per-stage funnel plus the surviving rows to
    * append to the corpus. Micro-batch ids are the batch numbers,
    * so replaying the stream equals the sequential batch replay
    * (StreamsSpec pins it against direct ingestBatch calls).
    *
    * REPLAY-SAFE under foreachBatch's at-least-once contract (r13
    * advisory #2): ingestBatch is replay-idempotent per batch number
    * — a replayed micro-batch (after a crash anywhere between the
    * registry appends and the handler's corpus append) receives the
    * ORIGINAL survivor set again, never an empty one, because every
    * registry probe excludes the batch's own prior rows. The handler
    * therefore achieves exactly-once by writing idempotently per
    * batch id (e.g. Overwrite into `corpus/batch_no=<id>/` — the
    * pattern StreamsSpec pins by invoking a batch's ingest twice).
    */
  def ingestStream(docs: DataFrame, idCol: String, textCol: String,
      exactReg: String, nearReg: String, bench: DataFrame,
      benchTextCol: String, checkpoint: String, minChars: Int = 100,
      vecReg: Option[String] = None, vecCol: Option[String] = None,
      minhashReg: Option[String] = None)(
      handler: (graft.pipeline.Pipelines.IngestBatchResult, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        // the chain's epoch anchors at the EXACT registry; the one
        // batch number stamps every lane, so the member registries
        // must not be shared with differently-anchored streams
        handler(graft.pipeline.Pipelines.ingestBatch(
          s, batch, idCol, textCol, exactReg, nearReg,
          bench, benchTextCol,
          epochBatchNo(s, exactReg, checkpoint, id), minChars,
          vecReg = vecReg, vecCol = vecCol, minhashReg = minhashReg), id)
      }
      .start()

  /** Streaming HLL maintenance — [[graft.ops.Hll]]'s ingestion
    * twin: each micro-batch registers ONLY its own keys and
    * max-merges with the prior version (the register monoid —
    * merge == registers-of-union is HllSpec-pinned), so state stays
    * ≤ |groups|·m rows regardless of stream length and the distinct
    * estimate reads off the maintained registers at any point via
    * [[graft.ops.Hll.estimate]]. StreamsSpec pins maintained ==
    * from-scratch over the batches' union.
    */
  def hllMaintStream(events: DataFrame, keyCol: String,
      groupCols: Seq[String], stateDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        maintainVersioned(stateDir, id,
          graft.ops.Hll.registers(batch, keyCol, groupCols))(
          (prior, fresh) => graft.ops.Hll.merge(prior, fresh, groupCols))
      }
      .start()

  /** Streaming rollup maintenance — [[graft.ops.Incremental]] driven
    * by a stream: each micro-batch aggregates ONLY its own rows into
    * a mergeable state and merges with the previous state version;
    * the base corpus is never rescanned, so per-batch cost is
    * O(batch) + O(groups). State versions are batchId-keyed dirs —
    * re-processing a batch after a restart overwrites the same
    * version, so the maintenance is idempotent under the
    * checkpoint's replay contract (at production scale the version
    * pointer lives in a catalog/transaction log; the directory
    * convention is this sandbox's stand-in). StreamsSpec pins the
    * maintained state against the from-scratch aggregate.
    */
  def rollupMaintStream(events: DataFrame, groupCol: String,
      valCol: String, stateDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        maintainVersioned(stateDir, id,
          graft.ops.Incremental.aggState(batch, groupCol, valCol))(
          (prior, fresh) => graft.ops.Incremental.merge(prior, fresh))
      }
      .start()

  /** Streaming transition-matrix maintenance — the
    * [[graft.ops.EventAnalytics.transitionCounts]] twin. Unlike the
    * funnel/retention states (pure sets, order-free), a bigram
    * count is ORDER-SENSITIVE across the batch boundary: the last
    * event of a user's stream in batch i and their first event in
    * batch i+1 form a transition no single batch sees. The state is
    * therefore two relations in one tagged table: the (from, to, n)
    * count monoid (`__kind = "c"`) and one boundary row per user —
    * their latest event (`__kind = "u"`). Each batch contributes its
    * in-batch bigrams, its per-user first rows (consumed by the
    * merge to close boundary transitions against the prior state's
    * last rows, then dropped), and its per-user last rows. Per-batch
    * cost O(batch) + O(users); events are never rescanned.
    *
    * Ordering contract (stated, not assumed silently): batches must
    * partition each user's stream in event-time order — the same
    * ingestion-order contract the sessionization and CDC twins
    * carry. A late event invalidates bigrams already counted; the
    * recovery is a from-scratch rebuild over the versioned base,
    * exactly as for the rollup family. StreamsSpec pins maintained
    * == from-scratch over boundary-straddling users.
    */
  def transitionsMaintStream(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      stateDir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val fresh = transitionState(batch, userCol, typeCol, tsCol,
          idCol)
        val merged =
          latestVersion(batch.sparkSession, stateDir, id) match {
            case Some(prior) => mergeTransitions(prior, fresh)
            case None => fresh.filter(col("__kind") =!= "f")
          }
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/v$id")
      }
      .start()

  /** The two-phase maintenance path as a batch computation (q206):
    * state from `first`, merge of `second`'s contribution, counts
    * out. The incremental path's result must equal the from-scratch
    * matrix whatever the cut — which is exactly what the q206
    * oracle hash-verifies (the q175 incremental-aggregate
    * discipline applied to ORDER-SENSITIVE state).
    */
  def transitionsMaintainBatch(first: DataFrame, second: DataFrame,
      userCol: String, typeCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val s0 = transitionState(first, userCol, typeCol, tsCol, idCol)
      .filter(col("__kind") =!= "f")
    val s1 = mergeTransitions(s0,
      transitionState(second, userCol, typeCol, tsCol, idCol))
    transitionsFromState(s1)
  }

  /** The counts relation of a maintained transition state, in the
    * batch operator's output shape.
    */
  def transitionsFromState(state: DataFrame): DataFrame =
    state.filter(col("__kind") === "c")
      .select(col("from_type"), col("to_type"), col("n"))
      .orderBy(col("from_type"), col("to_type"))

  /** One batch's contribution: in-batch bigram counts ("c"),
    * per-user first rows ("f", merge-time boundary closers),
    * per-user last rows ("u", the next boundary state).
    */
  private def transitionState(batch: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val tT = batch.schema(typeCol).dataType
    val nullT = lit(null).cast(tT)
    val nullU = lit(null).cast(batch.schema(userCol).dataType)
    val nullTs = lit(null).cast(batch.schema(tsCol).dataType)
    val nullId = lit(null).cast(batch.schema(idCol).dataType)
    val counts = batch
      .withColumn("__from", lag(col(typeCol), 1).over(wAsc))
      .filter(col("__from").isNotNull)
      .select(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .select(lit("c").as("__kind"), col("from_type"), col("to_type"),
        col("n"), nullU.as("__user"), nullTs.as("__ts"),
        nullId.as("__id"), nullT.as("__type"))
    def edge(kind: String,
        w: org.apache.spark.sql.expressions.WindowSpec) = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(lit(kind).as("__kind"), nullT.as("from_type"),
        nullT.as("to_type"), lit(null).cast("long").as("n"),
        col(userCol).as("__user"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(typeCol).as("__type"))
    counts.unionByName(edge("f", wAsc)).unionByName(edge("u", wDesc))
  }

  private def mergeTransitions(prior: DataFrame,
      fresh: DataFrame): DataFrame = {
    val sch = fresh.schema
    def nul(f: String) = lit(null).cast(sch(f).dataType).as(f)
    val pu = prior.filter(col("__kind") === "u")
    val ff = fresh.filter(col("__kind") === "f")
    val fu = fresh.filter(col("__kind") === "u")
    val bare = Seq("from_type", "to_type", "n").map(col)
    val boundary = pu
      .select(col("__user"), col("__type").as("__lt"))
      .join(ff.select(col("__user"), col("__type").as("__ft")), "__user")
      .groupBy(col("__lt").as("from_type"), col("__ft").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val counts = prior.filter(col("__kind") === "c").select(bare: _*)
      .unionByName(fresh.filter(col("__kind") === "c").select(bare: _*))
      .unionByName(boundary)
      .groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).as("n"))
      .select(lit("c").as("__kind"), col("from_type"), col("to_type"),
        col("n"), nul("__user"), nul("__ts"), nul("__id"),
        nul("__type"))
    val last = fu.unionByName(
      pu.join(fu.select(col("__user")), Seq("__user"), "left_anti")
        .select(fu.columns.toSeq.map(col): _*))
    counts.unionByName(last)
  }

  /** Streaming path-mining maintenance —
    * [[graft.ops.EventAnalytics.pathCounts]]'s twin, the
    * transition twin generalized from bigrams to length-`len`
    * windows. A window can span up to `len` batches, so the boundary
    * state is each user's trailing `len−1` events (the transition
    * state's last-row, pluralized). Correctness argument: every
    * window either sits inside one batch (counted by the in-batch
    * pass) or spans batches — and a spanning window has a UNIQUE
    * batch where it ENDS. The merge counts exactly the windows that
    * START in the prior tail and END in the batch head (an
    * origin-tag test on the oldest lag and the current row over the
    * contiguous tail++head segment), so no window is double-counted
    * and none is missed, even across 3+ tiny batches. Same
    * ingestion-order contract and versioned-base recovery as the
    * transition twin; per-batch cost O(batch) + O(users·len).
    */
  def pathsMaintStream(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String, len: Int,
      stateDir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val fresh = pathState(batch, userCol, typeCol, tsCol, idCol,
          len)
        val merged =
          latestVersion(batch.sparkSession, stateDir, id) match {
            case Some(prior) => mergePaths(prior, fresh, len)
            case None => fresh.filter(col("__kind") =!= "f")
          }
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/v$id")
      }
      .start()

  /** The two-phase path maintenance as a batch computation (q207) —
    * the q206 cut-invariance proof for the length-n generalization:
    * at corpus scale the midpoint cut puts THOUSANDS of users'
    * windows across the boundary, a far richer exercise of the
    * tail/head closure than any fixture.
    */
  def pathsMaintainBatch(first: DataFrame, second: DataFrame,
      userCol: String, typeCol: String, tsCol: String, idCol: String,
      len: Int): DataFrame = {
    val s0 = pathState(first, userCol, typeCol, tsCol, idCol, len)
      .filter(col("__kind") =!= "f")
    val s1 = mergePaths(s0,
      pathState(second, userCol, typeCol, tsCol, idCol, len), len)
    pathsFromState(s1)
  }

  /** The counts relation of a maintained path state, in the batch
    * operator's output shape.
    */
  def pathsFromState(state: DataFrame): DataFrame =
    state.filter(col("__kind") === "c")
      .select(col("path"), col("n"))
      .orderBy(col("n").desc, col("path"))

  private def pathState(batch: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      len: Int): DataFrame = {
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    def nulOf(c: String) = lit(null).cast(batch.schema(c).dataType)
    val counts = graft.ops.EventAnalytics
      .pathCounts(batch, userCol, typeCol, tsCol, idCol, len)
      .select(lit("c").as("__kind"), col("path"), col("n"),
        nulOf(userCol).as("__user"), nulOf(tsCol).as("__ts"),
        nulOf(idCol).as("__id"), nulOf(typeCol).as("__type"))
    def edge(kind: String,
        w: org.apache.spark.sql.expressions.WindowSpec) = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= len - 1)
      .select(lit(kind).as("__kind"),
        lit(null).cast("string").as("path"),
        lit(null).cast("long").as("n"), col(userCol).as("__user"),
        col(tsCol).as("__ts"), col(idCol).as("__id"),
        col(typeCol).as("__type"))
    counts.unionByName(edge("f", wAsc)).unionByName(edge("u", wDesc))
  }

  private def mergePaths(prior: DataFrame, fresh: DataFrame,
      len: Int): DataFrame = {
    val sch = fresh.schema
    def nul(f: String) = lit(null).cast(sch(f).dataType).as(f)
    val pu = prior.filter(col("__kind") === "u")
    val ff = fresh.filter(col("__kind") === "f")
    val fu = fresh.filter(col("__kind") === "u")
    // tail ++ head is a CONTIGUOUS segment of each user's stream, so
    // subset lags equal stream lags for any window inside it
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__user")).orderBy(col("__ts"), col("__id"))
    val tagged = pu.withColumn("__o", lit("T"))
      .unionByName(ff.withColumn("__o", lit("B")))
    val steps = (len - 1 to 0 by -1).map { off =>
      if (off == 0) col("__type") else lag(col("__type"), off).over(w)
    }
    val startO = lag(col("__o"), len - 1).over(w)
    val boundary = tagged
      .select(concat_ws(">", steps: _*).as("path"),
        (steps.map(_.isNotNull).reduce(_ && _) &&
          col("__o") === "B" && startO === "T").as("__take"))
      .filter(col("__take"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    val bare = Seq("path", "n").map(col)
    val counts = prior.filter(col("__kind") === "c").select(bare: _*)
      .unionByName(fresh.filter(col("__kind") === "c").select(bare: _*))
      .unionByName(boundary)
      .groupBy(col("path")).agg(sum(col("n")).as("n"))
      .select(lit("c").as("__kind"), col("path"), col("n"),
        nul("__user"), nul("__ts"), nul("__id"), nul("__type"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__user"))
      .orderBy(col("__ts").desc, col("__id").desc)
    val last = pu.unionByName(fu)
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") <= len - 1).drop("__rn")
    counts.unionByName(last)
  }

  /** Streaming EWMA-gate maintenance —
    * [[graft.ops.ControlChart]]'s twin: the spike/dip summary kept
    * live per micro-batch. Order-sensitive state, the path-twin
    * discipline at window length Depth+1: a row is gated in the
    * UNIQUE batch that CONTAINS it, and its depth-8 history either
    * sits in the same batch (the in-batch pass — any row with ≥8
    * in-batch priors) or reaches into prior batches. The merge
    * gates exactly the fresh head rows (first ≤8 per user — the
    * only rows with <8 in-batch priors) over the contiguous
    * tail++head segment, where the prior tail (trailing ≤8 per
    * user) supplies every stream prior a head row can need. No row
    * double-gated, none missed, users with genuinely short history
    * stay ungated in both paths. Per-batch cost O(batch) +
    * O(users·8); the corpus is never rescanned.
    */
  def ewmaMaintStream(events: DataFrame, userCol: String,
      valCol: String, tsCol: String, idCol: String, typeCol: String,
      k: Int, stateDir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val fresh = ewmaState(batch, userCol, valCol, tsCol, idCol,
          typeCol, k)
        val merged =
          latestVersion(batch.sparkSession, stateDir, id) match {
            case Some(prior) => mergeEwma(prior, fresh, typeCol, k)
            case None => fresh.filter(col("__kind") =!= "f")
          }
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/v$id")
      }
      .start()

  /** The two-phase EWMA maintenance as a batch computation (q209):
    * the q206 cut-invariance proof for per-row windowed STATE — the
    * from-scratch q208 summary is the oracle, so the check is that
    * the cut position doesn't matter.
    */
  def ewmaMaintainBatch(first: DataFrame, second: DataFrame,
      userCol: String, valCol: String, tsCol: String, idCol: String,
      typeCol: String, k: Int = 3): DataFrame = {
    val s0 = ewmaState(first, userCol, valCol, tsCol, idCol,
      typeCol, k).filter(col("__kind") =!= "f")
    val s1 = mergeEwma(s0, ewmaState(second, userCol, valCol, tsCol,
      idCol, typeCol, k), typeCol, k)
    ewmaFromState(s1, typeCol)
  }

  /** The summary relation of a maintained EWMA state, in the batch
    * operator's output shape.
    */
  def ewmaFromState(state: DataFrame, typeCol: String): DataFrame =
    state.filter(col("__kind") === "c")
      .select(col(typeCol), col("n_gated"), col("n_spike"),
        col("n_dip"), col("sum_absdev"))
      .orderBy(col(typeCol))

  /** One batch's contribution: the in-batch gate summary ("c"),
    * per-user leading ≤8 rows ("f", the merge-time boundary
    * candidates), per-user trailing ≤8 rows ("u", the next
    * boundary's history).
    */
  private def ewmaState(batch: DataFrame, userCol: String,
      valCol: String, tsCol: String, idCol: String, typeCol: String,
      k: Int): DataFrame = {
    import graft.ops.ControlChart
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    def nulOf(c: String) = lit(null).cast(batch.schema(c).dataType)
    val counts = ControlChart.ewmaSummary(batch, userCol, valCol,
      tsCol, idCol, typeCol, k)
      .select(lit("c").as("__kind"), col(typeCol), col("n_gated"),
        col("n_spike"), col("n_dip"), col("sum_absdev"),
        nulOf(userCol).as("__user"), nulOf(tsCol).as("__ts"),
        nulOf(idCol).as("__id"), lit(null).cast("long").as("__xq"))
    def edge(kind: String,
        w: org.apache.spark.sql.expressions.WindowSpec) = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= ControlChart.Depth)
      .select(lit(kind).as("__kind"), col(typeCol),
        lit(null).cast("long").as("n_gated"),
        lit(null).cast("long").as("n_spike"),
        lit(null).cast("long").as("n_dip"),
        lit(null).cast("long").as("sum_absdev"),
        col(userCol).as("__user"), col(tsCol).as("__ts"),
        col(idCol).as("__id"),
        floor(col(valCol) * 100).cast("long").as("__xq"))
    counts.unionByName(edge("f", wAsc)).unionByName(edge("u", wDesc))
  }

  private def mergeEwma(prior: DataFrame, fresh: DataFrame,
      typeCol: String, k: Int): DataFrame = {
    import graft.ops.ControlChart
    val sch = fresh.schema
    def nul(f: String) = lit(null).cast(sch(f).dataType).as(f)
    val pu = prior.filter(col("__kind") === "u")
    val ff = fresh.filter(col("__kind") === "f")
    val fu = fresh.filter(col("__kind") === "u")
    // tail ++ head is a CONTIGUOUS segment of each user's stream,
    // so in-segment lags equal stream lags for any head row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__user")).orderBy(col("__ts"), col("__id"))
    val tagged = pu.withColumn("__o", lit("T"))
      .unionByName(ff.withColumn("__o", lit("B")))
    val (dev, status) = ControlChart.gateColumns(col("__xq"), w, k)
    val seg = tagged
      .select(col(typeCol), dev.as("dev"), status.as("status"),
        col("__o"))
      .filter(col("__o") === "B")
    val boundary = ControlChart.summarize(seg, typeCol)
    val bare = Seq(typeCol, "n_gated", "n_spike", "n_dip",
      "sum_absdev").map(col)
    val counts = prior.filter(col("__kind") === "c").select(bare: _*)
      .unionByName(fresh.filter(col("__kind") === "c")
        .select(bare: _*))
      .unionByName(boundary)
      .groupBy(col(typeCol))
      .agg(sum(col("n_gated")).as("n_gated"),
        sum(col("n_spike")).as("n_spike"),
        sum(col("n_dip")).as("n_dip"),
        sum(col("sum_absdev")).as("sum_absdev"))
      .select(lit("c").as("__kind"), col(typeCol), col("n_gated"),
        col("n_spike"), col("n_dip"), col("sum_absdev"),
        nul("__user"), nul("__ts"), nul("__id"), nul("__xq"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__user"))
      .orderBy(col("__ts").desc, col("__id").desc)
    val last = pu.unionByName(fu)
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") <= ControlChart.Depth).drop("__rn")
    counts.unionByName(last)
  }

  /** Streaming corpus-composition maintenance — the
    * [[graft.ops.Concentration]] gate kept live over an ingest
    * stream: per-group counts are a mergeable monoid, so each
    * micro-batch aggregates only its own rows and merges into the
    * versioned state; `Concentration.ofCounts` then reads the gate
    * (entropy/Gini/top-share) from GROUP rows alone at any time.
    * Per-batch cost O(batch) + O(groups); the corpus is never
    * rescanned. StreamsSpec pins maintained == from-scratch.
    */
  def concentrationMaintStream(events: DataFrame, groupCol: String,
      stateDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        maintainVersioned(stateDir, id,
          batch.groupBy(col(groupCol)).agg(count(lit(1)).as("__c")))(
          (prior, fresh) => prior.unionByName(fresh)
            .groupBy(col(groupCol)).agg(sum(col("__c")).as("__c")))
      }
      .start()

  /** The two-phase attribution maintenance as a batch computation
    * (q229) — the cut-invariance discipline for TIME-HORIZON state:
    * a conversion is attributed in the batch that CONTAINS it, and
    * its lookback window either sits inside that batch or reaches
    * back at most `windowMs` — so the only boundary state is the
    * first half's trailing touches within the horizon (bounded by
    * per-user activity × window, never stream length). Conversions
    * partition three ways — first half (complete there: a
    * conversion's touches always precede it), second half with the
    * window fully past the cut (in-batch), second half with a
    * crossing window (recomputed over tail ∪ second touches) — and
    * attribution summaries are ADDITIVE over conversion sets, so
    * the three passes sum. Oracle = the from-scratch q218 SQL.
    */
  def attributionMaintainBatch(first: DataFrame, second: DataFrame,
      userCol: String, typeCol: String, tsCol: String,
      idCol: String, convType: String, touchTypes: Seq[String],
      windowMs: Long): DataFrame = {
    import graft.ops.EventAnalytics._
    val cut = second.agg(min(unix_millis(col(tsCol))).as("__cut"))
    val convA = conversions(first, userCol, typeCol, tsCol, idCol,
      convType)
    val touchA = touches(first, userCol, typeCol, tsCol, idCol,
      touchTypes)
    val convB = conversions(second, userCol, typeCol, tsCol, idCol,
      convType).crossJoin(broadcast(cut))
    val touchB = touches(second, userCol, typeCol, tsCol, idCol,
      touchTypes)
    // the horizon-bounded boundary state: first's touches within
    // windowMs of the cut
    val tail = touchA.crossJoin(broadcast(cut))
      .filter(col("__tt") >= col("__cut") - windowMs)
      .drop("__cut")
    val passA = attributionFromParts(convA, touchA, windowMs)
    val passInB = attributionFromParts(
      convB.filter(col("__tc") - windowMs >= col("__cut"))
        .drop("__cut"),
      touchB, windowMs)
    val passCross = attributionFromParts(
      convB.filter(col("__tc") - windowMs < col("__cut"))
        .drop("__cut"),
      tail.unionByName(touchB), windowMs)
    passA.unionByName(passInB).unionByName(passCross)
      .groupBy(col("touch_type"))
      .agg(sum(col("n_first")).as("n_first"),
        sum(col("n_last")).as("n_last"),
        sum(col("credit_e6")).as("credit_e6"))
      .orderBy(col("touch_type"))
  }

  /** Streaming SCD2 history maintenance —
    * [[graft.ops.EventAnalytics.scd2Intervals]] kept live: each
    * micro-batch computes its OWN interval relation (in-batch
    * collapse included) and merges against the prior state with one
    * boundary rule per key — if the batch's first change equals the
    * prior current value, that change is a no-op (drop it, the
    * prior current row extends through it); otherwise the prior
    * current row closes at the batch's first change. Versions shift
    * by the prior per-key maximum. The merge touches each key's
    * CURRENT row plus the batch's own rows — O(batch + keys), the
    * history body is carried, never recomputed.
    */
  def scd2MaintStream(events: DataFrame, keyCol: String,
      valCol: String, tsCol: String, idCol: String, stateDir: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val fresh = graft.ops.EventAnalytics.scd2Intervals(batch,
          keyCol, valCol, tsCol, idCol)
        val merged =
          latestVersion(batch.sparkSession, stateDir, id) match {
            case Some(prior) => mergeScd2(prior, fresh, keyCol)
            case None => fresh
          }
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/v$id")
      }
      .start()

  /** The two-phase SCD2 maintenance as a batch computation (q222):
    * intervals from `first`, merged with `second`'s — the q206
    * cut-invariance discipline for INTERVAL state, proved by the
    * from-scratch q219 oracle.
    */
  def scd2MaintainBatch(first: DataFrame, second: DataFrame,
      keyCol: String, valCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val s0 = graft.ops.EventAnalytics.scd2Intervals(first, keyCol,
      valCol, tsCol, idCol)
    val s1 = graft.ops.EventAnalytics.scd2Intervals(second, keyCol,
      valCol, tsCol, idCol)
    mergeScd2(s0, s1, keyCol)
  }

  private def mergeScd2(prior: DataFrame, fresh: DataFrame,
      keyCol: String): DataFrame = {
    val cols = Seq(keyCol, "version", "value_fx", "valid_from_us",
      "valid_to_us", "is_current").map(col)
    // each key's prior summit: current value and max version
    val summit = prior.filter(col("is_current"))
      .select(col(keyCol), col("value_fx").as("__curfx"))
      .join(prior.groupBy(col(keyCol))
        .agg(max(col("version")).as("__vmax")), keyCol)
    // boundary rule: the batch's first change collapses iff it
    // repeats the prior current value
    val f = fresh.join(summit, Seq(keyCol), "left")
    val surviving = f.filter(col("__curfx").isNull ||
      col("version") > 1 || col("value_fx") =!= col("__curfx"))
    // recompute the surviving-fresh chain per key: version renumber
    // and valid_to re-chain (dropping v1 breaks both)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("valid_from_us"))
    val chained = surviving
      .withColumn("version",
        (row_number().over(w) + coalesce(col("__vmax"), lit(0)))
          .cast("int"))
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(cols: _*)
    // keys whose fresh rows ALL collapsed (single no-op change):
    // prior current stays open; otherwise it closes at the first
    // surviving fresh change
    val firstSurv = chained.groupBy(col(keyCol))
      .agg(min(col("valid_from_us")).as("__close"))
    val priorAdj = prior.join(firstSurv, Seq(keyCol), "left")
      .withColumn("valid_to_us",
        when(col("is_current") && col("__close").isNotNull,
          col("__close")).otherwise(col("valid_to_us")))
      .withColumn("is_current",
        col("is_current") && col("__close").isNull)
      .select(cols: _*)
    priorAdj.unionByName(chained)
  }

  /** Streaming distinct-cardinality maintenance — the
    * [[graft.ops.DistinctSketch]] KMV sketch kept live over an
    * ingest stream: k-min hash sets are a mergeable monoid (union
    * then re-take the k smallest), so each micro-batch sketches
    * only its own rows and merges ≤ 2k longs into the versioned
    * state; `DistinctSketch`-style estimates read off the state at
    * any time. The distinct-count twin of the concentration
    * maintainer; StreamsSpec pins maintained == from-scratch.
    */
  def kmvMaintStream(events: DataFrame, keyCol: String, k: Int,
      stateDir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        maintainVersioned(stateDir, id,
          graft.ops.DistinctSketch.sketchOf(batch, col(keyCol), k))(
          (prior, fresh) => prior.unionByName(fresh).distinct()
            .orderBy(col("__h")).limit(k))
      }
      .start()

  /** The shared versioned-state-dir mechanics of every foreachBatch
    * maintenance stream (rollup, funnel, retention): merge the
    * batch's state with the latest prior version and write
    * batchId-keyed — re-processing a batch after a restart
    * overwrites the same version, so maintenance stays idempotent
    * under the checkpoint's replay contract.
    */
  private def maintainVersioned(stateDir: String, id: Long,
      newState: DataFrame)(
      mergeFn: (DataFrame, DataFrame) => DataFrame): Unit = {
    val merged = latestVersion(newState.sparkSession, stateDir, id) match {
      case Some(prior) => mergeFn(prior, newState)
      case None => newState
    }
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/v$id")
  }

  /** The newest state version strictly before `id` (None on a fresh
    * state dir) — shared by the maintainers and by gates that must
    * screen a batch against PRIOR state before merging it in.
    */
  private def latestVersion(spark: SparkSession, stateDir: String,
      id: Long): Option[DataFrame] = {
    val prior = Option(new java.io.File(stateDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.drop(1).toLong).filter(_ < id)
    if (prior.isEmpty) None
    else Some(spark.read.parquet(s"$stateDir/v${prior.max}"))
  }

  /** Streaming Bloom seen-set gate — [[graft.ops.Bloom]] at
    * ingestion: every micro-batch is flagged against the bloom of
    * ALL PRIOR batches' keys (packed from the maintained distinct
    * position set — the canonical union-mergeable state, ≤ mBits
    * rows), then its own positions merge into the state. The handler
    * receives the batch with a `probably_seen` column: false is
    * EXACT ("definitely new" — blooms have no false negatives), so
    * an ingestion dedup passes new rows straight through and routes
    * only the probably-seen minority to exact verification — the
    * whole history is never joined per batch. StreamsSpec pins the
    * no-false-negative guarantee and equality with the batch bloom
    * over the union of prior batches.
    */
  def bloomSeenStream(docs: DataFrame, keyCol: String, mBits: Int,
      kHash: Int, stateDir: String, checkpoint: String)(
      handler: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val bl = graft.ops.Bloom
        val words = latestVersion(batch.sparkSession, stateDir, id) match {
          case Some(prior) => bl.fitWords(prior, mBits)
          case None => new Array[Long]((mBits + 63) / 64)
        }
        handler(batch.withColumn("probably_seen",
          bl.containsCol(words, mBits, kHash, col(keyCol))), id)
        maintainVersioned(stateDir, id,
          bl.positions(batch, keyCol, mBits, kHash))(
          (prior, fresh) => prior.unionByName(fresh).distinct())
      }
      .start()

  /** Streaming funnel maintenance — the event-analytics twin of
    * [[rollupMaintStream]]: each micro-batch compacts to the
    * funnel-relevant state ([[graft.ops.EventAnalytics.funnelState]]
    * — distinct step-typed (user, type, ts) rows) and merges by
    * union + distinct with the prior version; the event stream is
    * never rescanned, and state is bounded by step-typed user
    * activity, not stream length. Any funnel form — ordered or
    * windowed — runs over the maintained state at read time;
    * StreamsSpec pins maintained == from-scratch for both.
    */
  def funnelMaintStream(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      stateDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        maintainVersioned(stateDir, id,
          graft.ops.EventAnalytics.funnelState(
            batch, userCol, typeCol, tsCol, steps))(
          (prior, fresh) => prior.unionByName(fresh).distinct())
      }
      .start()

  /** Streaming retention maintenance: the (user, week) pair state
    * ([[graft.ops.EventAnalytics.userWeeks]]) maintained per
    * micro-batch; the triangle
    * ([[graft.ops.EventAnalytics.retentionTriangle]]) reads off the
    * maintained state — users × active weeks rows, never events.
    * A user's cohort can legitimately move when an EARLIER event
    * arrives late; the min inside the finish step handles that
    * without any special casing, which is exactly why the state is
    * the pair set and not precomputed cohorts.
    */
  def retentionMaintStream(events: DataFrame, userCol: String,
      tsCol: String, stateDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        maintainVersioned(stateDir, id,
          graft.ops.EventAnalytics.userWeeks(batch, userCol, tsCol))(
          (prior, fresh) => prior.unionByName(fresh).distinct())
      }
      .start()

  /** Streaming n-gram-overlap decontamination — the stream twin of
    * [[graft.dedup.Dedup.ngramOverlapAcross]] (q150; the GPT-3
    * method). The benchmark reduces OFFLINE to its distinct window
    * digest set ([[graft.dedup.Dedup.windowDigestSet]], benchmark-
    * bounded like the compact NB model and the boilerplate hot set);
    * each arriving doc windows, digests, and counts hits entirely
    * map-side in one kernel. Stateless — no state store, no
    * watermark, no shuffle — so a contamination gate rides the
    * ingestion stream at any rate. Emits (… , n_windows, n_hit,
    * hit_frac); spec pins equality with the batch operator.
    */
  def decontamStream(docs: DataFrame, textCol: String,
      benchDigests: Set[String], n: Int = 13): DataFrame = {
    val statsUdf = udf { (text: String) =>
      val toks =
        if (text == null) Array.empty[String] else text.split(" ", -1)
      if (toks.length < n) (0L, 0L)
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        var hits = 0L
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          md.reset()
          val hex = md.digest(sb.toString.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          if (benchDigests.contains(hex)) hits += 1
          i += 1
        }
        ((toks.length - n + 1).toLong, hits)
      }
    }
    docs.withColumn("__s", statsUdf(col(textCol)))
      .withColumn("n_windows", col("__s._1"))
      .withColumn("n_hit", col("__s._2"))
      .withColumn("hit_frac",
        when(col("n_windows") > 0,
          round(col("n_hit") / col("n_windows").cast("double"), 4))
          .otherwise(lit(0.0)))
      .drop("__s")
  }

  /** Batch (non-streaming) sessionization over the same contract —
    * gap-based sessions via window lag, for parity testing and
    * backfills. Mirrors q31_sessionize's SQL shape.
    */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val tsMs = (unix_micros(col(tsCol)) / 1000L).cast("long")
    val newSession = when(
      tsMs - lag(tsMs, 1).over(byUser) > gapMs, 1).otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"))
  }
}
