package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators over the event stream. The reference
 * approximates streaming with nightly cron micro-batches plus a
 * `[migration-log]` low-watermark (SURVEY §2.9) — here the same
 * computations are expressed as genuine streaming transforms that work
 * identically under `readStream` (with `Trigger.AvailableNow()` for the
 * reference's batch cadence) and plain batch DataFrames.
 *
 * Every transform takes and returns DataFrames so it can be unit-tested
 * with `MemoryStream` and deployed with any source/sink pair.
 */
object EventStreams {

  /** Tumbling event-time window aggregation with a late-data watermark —
    * the streaming twin of query q24_hourly_events. */
  def hourlyCounts(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization via the BUILT-IN `session_window` — the
    * preferred composition when the output is aggregate-shaped
    * (start/end/count): Spark manages the session state store, merges
    * adjacent windows, and evicts on the watermark with zero custom
    * state code. [[sessionize]] keeps the custom state machine for
    * outputs a window aggregate cannot express (per-event session
    * tagging, mid-session emission). Note the built-in's `end` is
    * `last event + gap` (the window extent), not the last event time. */
  def sessionizeWindows(events: DataFrame, gap: String,
                        lateness: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  // ── stateful sessionization (flatMapGroupsWithState) ──

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  /**
   * Gap-based sessionization with per-user state: a session closes after
   * `gapMs` of inactivity (processing-time timeout carries the state
   * machine; the batch twin is query q23_sessionize). Custom state via
   * `flatMapGroupsWithState` — the Spark-native replacement for anything
   * the reference would have done row-at-a-time in JS.
   */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastSeen <= gapMs =>
                cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1))
              case Some(s) =>
                closed ::= SessionOut(user, new Timestamp(s.sessionStart),
                  new Timestamp(s.lastSeen), s.nEvents)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          if (state.hasTimedOut) {
            val s = state.get
            closed ::= SessionOut(user, new Timestamp(s.sessionStart),
              new Timestamp(s.lastSeen), s.nEvents)
            state.remove()
          }
          closed.reverseIterator
      }
  }

  /**
   * Watermarked stream-stream interval join: each event is enriched
   * with lookup-stream rows for the same key whose event time falls in
   * `[eventTs - within, eventTs]` — the streaming twin of the as-of
   * document-chain lookups (J6/J8). Both sides carry watermarks and the
   * join condition bounds the event-time distance, so Spark can evict
   * buffered state past `watermark + within` on either side — the state
   * store stays bounded no matter how long the streams run, which is
   * the whole game at production cadence. Append-mode safe.
   *
   * Column contract: the key column shares its name on both sides
   * (joined and emitted once); the two event-time columns must be
   * distinctly named.
   */
  def enrichWithinInterval(events: DataFrame, lookups: DataFrame,
                           key: String, eventTs: String, lookupTs: String,
                           lateness: String = "1 hour",
                           within: String = "15 minutes"): DataFrame = {
    require(eventTs != lookupTs,
      "event-time columns must be distinctly named on the two streams")
    val l = events.withWatermark(eventTs, lateness).alias("l")
    val r = lookups.withWatermark(lookupTs, lateness).alias("r")
    l.join(r,
        col(s"l.$key") === col(s"r.$key") &&
          col(lookupTs) <= col(eventTs) &&
          col(lookupTs) >= col(eventTs) - expr(s"INTERVAL $within"))
      .drop(col(s"r.$key"))
  }

  /** Deduplicating upsert stream: latest record per key within the
    * watermark — `dropDuplicates` on the natural key, the streaming
    * analog of the reference's staging + MERGE idempotence (S8). */
  def dedupedByKey(events: DataFrame, keyCol: String,
                   lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCol)

  /**
   * Micro-batch incremental ingestion — the Spark-native replacement for
   * the reference's entire cron + `[migration-log]` watermark machinery
   * (SURVEY §2.9): a file-source stream with `Trigger.AvailableNow`
   * processes exactly the data that arrived since the last run (the
   * checkpoint IS the watermark, transactionally maintained), applies
   * `transform`, and MERGEs each batch into the fact via `foreachBatch`.
   * Run it on any schedule; reruns with the same checkpoint are no-ops
   * on already-seen files.
   */
  def microBatchUpsert(spark: org.apache.spark.sql.SparkSession,
                       sourceDir: String,
                       schema: org.apache.spark.sql.types.StructType,
                       transform: DataFrame => DataFrame,
                       targetPath: String, keys: Seq[String],
                       checkpoint: String,
                       partitionBy: Seq[String] = Nil): Unit = {
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = transform(batch.toDF())
        // with a partitioned fact, each micro-batch rewrites only the
        // partitions it touches (see UpsertWriter.upsertPartitionPruned)
        if (partitionBy.nonEmpty)
          graft.sink.UpsertWriter.upsertPartitionPruned(spark, b,
            targetPath, keys, partitionBy): Unit
        else
          graft.sink.UpsertWriter.upsert(spark, b, targetPath, keys): Unit
      }
      .start()
    q.awaitTermination()
  }

  /**
   * Micro-batch near-dedup ingestion — [[microBatchUpsert]] composed
   * with [[graft.operators.Dedup.incrementalNearDedup]]: every arriving
   * batch is near-deduplicated against the PERSISTENT signature state
   * (k longs per ever-seen document, at `statePath`) before its
   * survivors MERGE into the corpus. The historical text is never
   * re-read; reruns with the same checkpoint are no-ops; and because
   * the drop rule is keep-first, the corpus equals what a one-shot
   * dedup of all batches would keep (DedupSpec asserts the batch
   * equivalence). This is the streaming form of the nightly
   * training-corpus ingest: dedup happens ON THE WAY IN, not as a
   * corpus-wide rewrite.
   *
   * Doc ids must be monotone across batches (the natural arrival
   * order) for keep-first to mean keep-oldest.
   *
   * `gate` is the curation hook (quality predicates, PII scrub, span
   * gates — anything per-batch): it runs BEFORE dedup, and rejected
   * documents enter neither the corpus nor the signature state — a
   * rejected doc must not shadow a later acceptable near-copy.
   */
  def microBatchNearDedup(spark: org.apache.spark.sql.SparkSession,
                          sourceDir: String,
                          schema: org.apache.spark.sql.types.StructType,
                          idCol: String, textCol: String,
                          targetPath: String, statePath: String,
                          checkpoint: String,
                          n: Int = 3, k: Int = 64, bands: Int = 8,
                          threshold: Double = 0.5,
                          gate: org.apache.spark.sql.DataFrame =>
                            org.apache.spark.sql.DataFrame = identity)
      : Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val gated = gate(batch.toDF())
        val seen =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
            Some(spark.read.parquet(statePath))
          else None
        val (survivors, state) = graft.operators.Dedup.incrementalNearDedup(
          gated, idCol, textCol, seen, n, k, bands, threshold)
        graft.sink.UpsertWriter.upsert(spark, survivors, targetPath,
          Seq(idCol)): Unit
        // append ONLY this batch's signatures (the state grows by the
        // batch, it is never rewritten) through the staged atomic
        // promote, so a crash mid-swap cannot lose the state either
        val newSigs = state.join(
          gated.select(col(idCol).as("doc_id")),
          Seq("doc_id"), "left_semi")
        graft.sink.UpsertWriter.upsert(spark, newSigs, statePath,
          Seq("doc_id")): Unit
        graft.ops.materialize.releaseAll()
      }
      .start()
    q.awaitTermination()
  }

  /**
   * Streaming ANN-index ingest — the persisted IVF+PQ state
   * ([[graft.operators.AnnIndex]]) maintained by a stream: each
   * micro-batch of new vectors is encoded with the PERSISTED model (no
   * re-fit, the [[graft.operators.AnnIndex.appendToAnnIndex]]
   * contract) and appended per-bucket to the codes table, so the index
   * a nightly search reads is always current up to the last completed
   * batch. The index must have been built once
   * ([[graft.operators.AnnIndex.writeAnnIndex]]) before the stream
   * starts — the model is a prerequisite, exactly like the dedup
   * signature state's first batch.
   */
  /**
   * The full persisted-ANN-index maintenance loop as ONE streaming
   * sink: per micro-batch, (1) land the batch's raw vectors in
   * `corpusTable` (append-only — the historical corpus is WRITTEN
   * here, never read back on the append path), (2) encode-and-append
   * the not-yet-indexed ids with the FROZEN model, (3) evaluate the
   * reconstruction-error drift policy and, if the appended
   * generations' error has decayed past `maxRatio`, rebuild the index
   * over `corpusTable` mid-stream. Each batch's decision is recorded
   * in `<base>_maintenance` `(batch_id, appended, ratio, rebuilt)` so
   * an operator (and the soak test) can see exactly when the policy
   * tripped.
   *
   * Scale shape: normal batches cost one anti-join against the codes
   * table's id column plus the frozen-model encode of the batch —
   * nothing corpus-sized moves. Only a tripped policy pays a corpus
   * read, and that read is the rebuild's fit+encode, already the
   * by-design cost of [[graft.operators.AnnIndex.rebuildIfStale]].
   *
   * Takes the streaming DataFrame (not a path) so MemoryStream soaks
   * and any readStream source drive the same code.
   */
  def microBatchIndexMaintain(vectors: DataFrame, idCol: String,
                              vecCol: String, base: String,
                              corpusTable: String, checkpoint: String,
                              dim: Int, nCentroids: Int, m: Int, pqK: Int,
                              buckets: Int, maxRatio: Double)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sess = batch.sparkSession
        import sess.implicits._
        // at-least-once redelivery makes ids the idempotency key for
        // BOTH tables; pin the batch once so corpus and index appends
        // describe the same rows even under non-deterministic sources
        val pinned = graft.ops.materialize(batch.toDF())
        try {
          sess.catalog.refreshTable(corpusTable)
          val inCorpus = sess.table(corpusTable)
            .select(col(idCol).cast("long").as("__cid"))
          val newRows = pinned
            .join(inCorpus, pinned(idCol).cast("long") === col("__cid"),
              "left_anti")
          newRows.write.format("parquet").mode(SaveMode.Append)
            .saveAsTable(corpusTable)
          sess.catalog.refreshTable(corpusTable)

          val before = sess.table(s"${base}_codes").count()
          appendFreshToIndex(pinned, idCol, vecCol, base, buckets)
          val appended = sess.table(s"${base}_codes").count() - before

          val ratio = graft.operators.AnnIndex.staleness(sess, base).ratio
          val rebuilt = graft.operators.AnnIndex.rebuildIfStale(
            sess.table(corpusTable), idCol, vecCol, base, dim,
            maxRatio = maxRatio, nCentroids = nCentroids, m = m, pqK = pqK,
            buckets = buckets)
          Seq((batchId, appended, ratio, rebuilt))
            .toDF("batch_id", "appended", "ratio", "rebuilt")
            .write.format("parquet").mode(SaveMode.Append)
            .saveAsTable(s"${base}_maintenance")
          // a rebuild OVERWRITES the model tables from the cloned
          // foreachBatch session; drop both sessions' cached file-list
          // snapshots or the caller's next read serves deleted files
          val caller = vectors.sparkSession
          for (t <- Seq(s"${base}_centroids", s"${base}_codebooks",
              s"${base}_codes", s"${base}_stats", s"${base}_maintenance",
              corpusTable)) {
            sess.catalog.refreshTable(t)
            caller.catalog.refreshTable(t)
          }
        } finally graft.ops.materialize.release(pinned)
      }
      .start()

  /** Shared per-batch half of the streaming index paths: append the
    * batch rows whose ids are not yet in `<base>_codes` with the
    * frozen model (id-pruned anti-join — redelivered batches are
    * no-ops; non-numeric ids fail fast; null ids are skipped). */
  private def appendFreshToIndex(batch: DataFrame, idCol: String,
                                 vecCol: String, base: String,
                                 buckets: Int): Unit = {
    val sess = batch.sparkSession
    sess.catalog.refreshTable(s"${base}_codes")
    val already = sess.table(s"${base}_codes")
      .select(org.apache.spark.sql.functions.col("neighbor_id"))
    val withKey = batch.withColumn("__long_id", batch(idCol).cast("long"))
    val nonNumeric = withKey
      .filter(batch(idCol).isNotNull && col("__long_id").isNull)
    require(nonNumeric.isEmpty,
      s"index append requires long-castable '$idCol' ids; found " +
        s"non-numeric values (e.g. " +
        s"${nonNumeric.select(idCol).head().get(0)})")
    val keyed = withKey.filter(col("__long_id").isNotNull)
    val fresh = keyed.join(already,
      keyed("__long_id") === already("neighbor_id"),
      "left_anti").drop("__long_id")
    graft.operators.AnnIndex.appendToAnnIndex(sess, fresh,
      idCol, vecCol, base, buckets)
  }

  /** Streaming ingest into the standing lexical index — the
    * [[microBatchIndexAppend]] twin over
    * [[graft.operators.LexIndex]] state. foreachBatch is
    * at-least-once; exactly-once lands in
    * [[graft.operators.LexIndex.appendToLexIndexExactlyOnce]], which
    * needs the BATCH ID (postings are doc-id-idempotent, but
    * zero-token docs leave no postings footprint, so the N/T stats
    * row is keyed by batch id and written last — see its Scaladoc
    * for the crash-window argument). */
  def microBatchLexAppend(spark: org.apache.spark.sql.SparkSession,
                          sourceDir: String,
                          schema: org.apache.spark.sql.types.StructType,
                          idCol: String, textCol: String, base: String,
                          checkpoint: String,
                          buckets: Int = 16): Unit = {
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.operators.LexIndex.appendToLexIndexExactlyOnce(
          batch.sparkSession, batch.toDF(), idCol, textCol, base,
          batchId = id, buckets = buckets)
        ()
      }
      .start()
    q.awaitTermination()
    // appends ran in the stream's cloned session; drop the caller
    // session's snapshots so its next read lists the new files
    spark.catalog.refreshTable(s"${base}_postings")
    spark.catalog.refreshTable(s"${base}_lexstats")
  }

  def microBatchIndexAppend(spark: org.apache.spark.sql.SparkSession,
                            sourceDir: String,
                            schema: org.apache.spark.sql.types.StructType,
                            idCol: String, vecCol: String, base: String,
                            checkpoint: String,
                            buckets: Int = 16): Unit = {
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // foreachBatch is at-least-once: a crash between the append
        // commit and the checkpoint write re-delivers the batch on
        // restart. Vector ids are unique in the corpus (the index's
        // key contract), so appending only ids not already indexed
        // makes re-delivery a no-op — an id-pruned column read of the
        // codes table, not a rescan of its payload. The helper reads
        // and writes through the BATCH's session (streaming runs
        // foreachBatch in a cloned session) and refreshes the codes
        // table first: a stale cached file-list snapshot would
        // resurrect already-indexed ids or hide a prior wave's appends.
        // Null ids are skipped (they can never match the anti-join and
        // would re-append on EVERY redelivery); non-null ids that fail
        // the long cast are a schema misconfiguration and fail the
        // stream on batch 1 instead of building an empty index forever.
        appendFreshToIndex(batch.toDF(), idCol, vecCol, base, buckets)
      }
      .start()
    q.awaitTermination()
    // every append ran in the stream's cloned session; drop the
    // caller-session snapshot so its next read lists the new files
    spark.catalog.refreshTable(s"${base}_codes")
  }
}
