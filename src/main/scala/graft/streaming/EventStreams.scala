package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
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
        // codes table, not a rescan of its payload
        // read + write through the BATCH's session (streaming runs
        // foreachBatch in a cloned session): the clone can inherit a
        // stale cached file-list snapshot of the codes table from the
        // session that started the stream, so refresh before reading —
        // a stale snapshot here would resurrect already-indexed ids
        // into `fresh` or hide a prior wave's appends from the anti-join
        val sess = batch.sparkSession
        sess.catalog.refreshTable(s"${base}_codes")
        val already = sess.table(s"${base}_codes")
          .select(org.apache.spark.sql.functions.col("neighbor_id"))
        // ids are the idempotency key: a null id can never match the
        // anti-join, so it would re-append on EVERY redelivery — skip
        // those rows. But a NON-NULL id that fails the long cast is a
        // schema misconfiguration (UUID/string ids), and silently
        // dropping those would build an empty index batch after batch
        // while reporting success — fail the stream on batch 1 instead
        val withKey = batch.toDF()
          .withColumn("__long_id", batch(idCol).cast("long"))
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
      .start()
    q.awaitTermination()
    // every append ran in the stream's cloned session; drop the
    // caller-session snapshot so its next read lists the new files
    spark.catalog.refreshTable(s"${base}_codes")
  }
}
