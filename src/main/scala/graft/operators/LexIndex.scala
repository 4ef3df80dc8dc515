package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Standing lexical (BM25) index — the persisted-postings twin of
 * [[AnnIndex]], closing the last per-call corpus scan in the hybrid
 * retrieval service: [[CorpusStats.bm25TopK]] re-explodes the whole
 * corpus into postings on EVERY probe batch, which at 100 TB is the
 * dominant cost of the lexical leg (the dense leg already rides the
 * persisted IVF+PQ index). This module persists that explode once and
 * answers every later batch from state:
 *
 *   `<base>_postings` (term, doc_id, tf, len)  bucketed+sorted by term
 *   `<base>_lexstats` (generation, n_docs, n_toks)   one row per batch
 *   `<base>_lexkey`   (n, fp, buckets)         the ensure-freshness key
 *
 * Scoring is the integer-quantized Okapi of [[CorpusStats.bm25TopK]]
 * (BM25 per Robertson & Sparck Jones; k1 = 1.2, b = 0.75 folded into
 * exact DECIMAL integer arithmetic) — [[bm25TopKIndexed]] over an index
 * built from corpus C is BIT-IDENTICAL to `bm25TopK(C, ...)` (asserted
 * in LexIndexSpec), because every scoring expression is the same and
 * the inputs it sees (postings rows, per-term df, corpus scalars N/T)
 * are equal by construction:
 *
 *  - postings rows are exactly bm25TopK's `posts` aggregate, persisted;
 *  - df for a query term is counted FROM the vocab-gated postings, the
 *    same count the per-call plan produces (the gate keeps every
 *    posting of a query term);
 *  - N and T come from `_lexstats` generation rows summed at query
 *    time — the [[AnnIndex.appendToAnnIndex]] stats discipline — and
 *    each generation row is computed with bm25TopK's exact expressions
 *    (empty and null-text docs count in N and contribute 0 to T), so
 *    the sums equal the one-shot aggregate over the accumulated corpus.
 *
 * Query-time plan shape at 100 TB: the state side is ONE scan of the
 * bucketed postings table. With `collectVocab = true` (default) the
 * probe vocabulary is collected driver-side — bounded by the probe
 * batch, the [[AnnIndex.ivfPqTopKBucketed]] collect-probes standing —
 * and pushed as an `isin` predicate, so the scan bucket-prunes to the
 * query terms' buckets and the `sortBy(term)` layout row-group-prunes
 * inside them. Honest scaling claim: what the index REMOVES from every
 * batch is the corpus explode + (doc, term) aggregate — the dominant
 * per-call cost (measured 1.6–1.9× warm at sf1–sf4, `tools/LexScale`);
 * the scan-side pruning narrows with the probe vocabulary, so a
 * NARROW vocabulary (autocomplete, keyword lookup) gets
 * vocabulary-proportional reads while a WIDE one (whole eval documents
 * as probes) touches most buckets and keeps only the saved explode.
 * Everything after the scan is vocabulary-proportional on every path.
 * Because the bucketed scan reports
 * hash-partitioning on `term`, the per-term df aggregate and the
 * scoring joins (query terms and idf broadcast) plan NO state-side
 * Exchange; the only shuffles carry scored candidates, capped at k rows
 * per probe per map task by the mergeable `graft_topk` aggregate.
 * `collectVocab = false` gates with a plain (AQE-planned) join instead
 * — no driver collect AND no forced broadcast anywhere the probe
 * vocabulary rides, for probe batches whose vocabulary itself is huge
 * — at the price of scanning all buckets once.
 *
 * Reference anchor: the reference ETL's standing warehouse tables
 * (e.g. `/root/reference/Lib/Migrations` staging discipline) hold
 * derived state that incremental runs append to rather than recompute;
 * this module applies that discipline to the retrieval-scale postings
 * artifact (a "beyond the reference" training-data operator, like
 * [[AnnIndex]]).
 */
object LexIndex {

  /** bm25TopK's integral-id contract, shared by the index build: doc
    * ids ride the top-k aggregate as LONG, so only exact-integral
    * column types are accepted (see [[CorpusStats.bm25TopK]]). */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val idField = df.schema.find(f => resolver(f.name, idCol))
      .getOrElse(throw new IllegalArgumentException(
        s"LexIndex: id column $idCol not found in " +
          s"[${df.schema.fieldNames.mkString(", ")}]"))
    idField.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case d: DecimalType if d.scale == 0 && d.precision <= 18 => ()
      case other => throw new IllegalArgumentException(
        s"LexIndex requires an integral id column; got $idCol: " +
          s"${other.simpleString}. Map non-integral ids to a unique " +
          "integral surrogate first.")
    }
  }

  /** bm25TopK's `posts` aggregate: one corpus explode →
    * (term, doc_id, tf, len), map-side combined on (doc_id, term).
    * Zero-token docs produce no postings (they still count in the
    * stats row — see [[statsRow]]). */
  private def postings(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("len"),
        explode(col("__toks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
      .select(col("term"), col("doc_id"), col("tf"), col("len"))

  /** bm25TopK's corpus scalars over exactly `docs`: N counts every row
    * (empty/null text included), T sums token counts with null text
    * pinned to 0 under both null-semantics regimes. `batchId` is -1
    * for manual builds/appends; the streaming exactly-once path stamps
    * its foreachBatch id here so redelivered batches are detectable
    * (the query-time N/T aggregate ignores the column). */
  private def statsRow(docs: DataFrame, textCol: String,
                       generation: Int, batchId: Long = -1L): DataFrame =
    docs.select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(greatest(size(col("__toks")), lit(0)).cast("long")),
          lit(0L)).as("n_toks"))
      .select(lit(generation).as("generation"), col("n_docs"),
        col("n_toks"), lit(batchId).as("batch_id"))

  /**
   * Fit-free full build: drop + rewrite postings and the generation-0
   * stats row. Idempotent over an unchanged corpus (the aggregates are
   * deterministic); rows arriving AFTER a build go through
   * [[appendToLexIndex]]. The `_lexkey` freshness table is
   * [[ensureLexIndex]]'s concern, not this method's.
   */
  def writeLexIndex(docs: DataFrame, idCol: String, textCol: String,
                    base: String, buckets: Int = 16): Unit = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    requireIntegralId(docs, idCol)
    val spark = docs.sparkSession
    // tombstones described the previous index generation
    AnnIndex.dropStale(spark, s"${base}_postings")
    AnnIndex.dropStale(spark, s"${base}_lexstats")
    AnnIndex.dropStale(spark, s"${base}_tombstones")
    postings(docs, idCol, textCol)
      .write.bucketBy(buckets, "term").sortBy("term")
      .format("parquet").mode(SaveMode.Overwrite)
      .saveAsTable(s"${base}_postings")
    statsRow(docs, textCol, generation = 0).coalesce(1)
      .write.mode(SaveMode.Overwrite).saveAsTable(s"${base}_lexstats")
    spark.catalog.refreshTable(s"${base}_postings")
    spark.catalog.refreshTable(s"${base}_lexstats")
  }

  /**
   * Build-if-needed — the [[AnnIndex.ensureAnnIndex]] corpus-key
   * discipline verbatim: rebuild ONLY when the persisted one-row
   * `<base>_lexkey` is absent or names a different (corpus key,
   * buckets); the key is dropped BEFORE the rebuild (a crash mid-build
   * leaves no key, so the next call rebuilds — never a stale key over
   * mixed postings) and written only after every table committed.
   * Returns true when a build ran.
   */
  def ensureLexIndex(docs: DataFrame, idCol: String, textCol: String,
                     base: String, key: (Long, Long),
                     buckets: Int = 16): Boolean = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fresh = scala.util.Try {
      val r = spark.table(s"${base}_lexkey").head()
      (r.getLong(0), r.getLong(1)) == key && r.getLong(2) == buckets.toLong
    }.getOrElse(false)
    if (fresh) false
    else {
      AnnIndex.dropStale(spark, s"${base}_lexkey")
      writeLexIndex(docs, idCol, textCol, base, buckets)
      Seq((key._1, key._2, buckets.toLong)).toDF("n", "fp", "buckets")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .saveAsTable(s"${base}_lexkey")
      true
    }
  }

  /**
   * [[ensureLexIndex]] with the caller's corpus-key aggregation gated
   * behind [[StandingState.ensureWithSnapshot]] (r20): `key` — the
   * corpus-sized (count, id+text-length fingerprint) scan — evaluates
   * only when the corpus's physical snapshot is not already verified
   * against the persisted `<base>_lexkey` row, so a steady-state
   * probe call plans NO corpus-sized scan. Returns the corpus key in
   * force; correctness contract is [[ensureLexIndex]]'s, freshness
   * semantics [[StandingState.ensureWithSnapshot]]'s.
   */
  def ensureLexIndexSnap(docs: DataFrame, idCol: String, textCol: String,
                         base: String, key: => (Long, Long),
                         buckets: Int = 16): (Long, Long) =
    StandingState.ensureWithSnapshot(docs, s"${base}_lexkey", key) { k =>
      ensureLexIndex(docs, idCol, textCol, base, k, buckets)
      ()
    }

  /**
   * Nightly ingest: explode ONLY the batch into postings and append
   * (Spark appends per-bucket files; `buckets` must match the build),
   * plus one new `_lexstats` generation row. Stats-first ordering and
   * the batch pin follow [[AnnIndex.appendToAnnIndex]]: the pin
   * guarantees the stats row and the appended postings describe the
   * same rows even when the batch plan is non-deterministic, and
   * writing stats before postings means a crash between the two leaves
   * the index UNDER-counting N/T (scores drift conservatively, and the
   * next successful append re-converges) rather than counting docs
   * whose postings never landed.
   *
   * Caller contract: batch doc ids must be new (an id appended twice
   * doubles its tf — same last-writer duty as appendToAnnIndex), and
   * must not be STILL-tombstoned (refused loudly — run
   * [[compactLexIndex]] first, whose fold makes the re-append exact).
   * Append-then-query ≡ one-shot build over the union (LexIndexSpec).
   */
  def appendToLexIndex(spark: SparkSession, rows: DataFrame, idCol: String,
                       textCol: String, base: String,
                       buckets: Int = 16): Unit = {
    requireIntegralId(rows, idCol)
    StandingState.requireNotTombstoned(spark, s"${base}_tombstones",
      rows, idCol,
      "compactLexIndex (drops the dead postings and folds the N/T " +
        "bookkeeping, after which the re-append counts exactly once)")
    val batch = graft.ops.materialize(rows)
    try {
      val gen = spark.table(s"${base}_lexstats")
        .agg(coalesce(max(col("generation")), lit(-1))).head().getInt(0) + 1
      statsRow(batch, textCol, gen).coalesce(1)
        .write.mode(SaveMode.Append).saveAsTable(s"${base}_lexstats")
      spark.catalog.refreshTable(s"${base}_lexstats")
      rows.sparkSession.catalog.refreshTable(s"${base}_lexstats")
      postings(batch, idCol, textCol)
        .write.bucketBy(buckets, "term").sortBy("term")
        .format("parquet").mode(SaveMode.Append)
        .saveAsTable(s"${base}_postings")
      spark.catalog.refreshTable(s"${base}_postings")
      rows.sparkSession.catalog.refreshTable(s"${base}_postings")
    } finally graft.ops.materialize.release(batch)
  }

  /**
   * EXACTLY-ONCE append for streaming ingest (the foreachBatch
   * at-least-once contract): a redelivered batch must not double tf
   * in the postings nor double-count N/T in the stats — and unlike
   * the ANN path, a lexical batch can contain ZERO-TOKEN docs that
   * leave no postings footprint, so postings-side id dedup alone
   * cannot make the stats row idempotent. Two mechanisms compose:
   *
   *  - postings are id-idempotent: only batch docs whose ids are not
   *    already posted append (column-pruned anti-join on doc_id, the
   *    [[graft.streaming.EventStreams]] appendFreshToIndex
   *    discipline);
   *  - the stats row is written LAST and carries `batchId`; a
   *    redelivery that finds its batch id already in `_lexstats`
   *    skips entirely.
   *
   * Crash anywhere inside the window converges on redelivery: stats
   * row absent ⇒ re-run — the anti-join re-appends only the postings
   * that didn't land, then the stats row (computed from the FULL
   * batch, not the fresh subset — N/T must describe every batch row)
   * commits the batch. Stats row present ⇒ both tables are complete.
   * Returns true when the batch was (newly) applied.
   *
   * Contract boundary: batch ids are stable only under a STABLE
   * checkpoint (the standard foreachBatch exactly-once recipe). A
   * wiped checkpoint restarts ids at 0 — safe when every prior batch
   * completed (the collision skips an already-applied superset), but
   * a wipe that also folds NEW files into the colliding batch id
   * would skip them: never wipe a live checkpoint.
   */
  def appendToLexIndexExactlyOnce(spark: SparkSession, rows: DataFrame,
                                  idCol: String, textCol: String,
                                  base: String, batchId: Long,
                                  buckets: Int = 16): Boolean = {
    require(batchId >= 0L, s"batchId must be non-negative, got $batchId")
    requireIntegralId(rows, idCol)
    spark.catalog.refreshTable(s"${base}_postings")
    spark.catalog.refreshTable(s"${base}_lexstats")
    val done = !spark.table(s"${base}_lexstats")
      .filter(col("batch_id") === batchId).isEmpty
    if (done) false
    else {
      // same re-append guard as the manual path: a tombstoned id's
      // fresh postings would be invisible while the stats row counts
      // it — refuse loudly (checked only for undelivered batches; an
      // already-applied batch skipped above never re-reaches here)
      StandingState.requireNotTombstoned(spark, s"${base}_tombstones",
        rows, idCol,
        "compactLexIndex (drops the dead postings and folds the N/T " +
          "bookkeeping, after which the re-append counts exactly once)")
      val batch = graft.ops.materialize(rows)
      try {
        val already = spark.table(s"${base}_postings").select(col("doc_id"))
        val fresh = batch.join(already,
          batch(idCol) === already("doc_id"), "left_anti")
        postings(fresh, idCol, textCol)
          .write.bucketBy(buckets, "term").sortBy("term")
          .format("parquet").mode(SaveMode.Append)
          .saveAsTable(s"${base}_postings")
        spark.catalog.refreshTable(s"${base}_postings")
        rows.sparkSession.catalog.refreshTable(s"${base}_postings")
        val gen = spark.table(s"${base}_lexstats")
          .agg(coalesce(max(col("generation")), lit(-1))).head()
          .getInt(0) + 1
        statsRow(batch, textCol, gen, batchId).coalesce(1)
          .write.mode(SaveMode.Append).saveAsTable(s"${base}_lexstats")
        spark.catalog.refreshTable(s"${base}_lexstats")
        rows.sparkSession.catalog.refreshTable(s"${base}_lexstats")
        true
      } finally graft.ops.materialize.release(batch)
    }
  }

  /**
   * DELETE from the standing lexical index — the
   * [[AnnIndex.tombstoneAnnIds]] twin, with one lexical extra: N and T
   * feed the BM25 idf and length normalization, so a deleted doc must
   * leave the corpus scalars too, EXACTLY. Each tombstone row carries
   * the doc's own token count, read from its postings while they are
   * still in hand (`max(len)` — the per-doc length rides every
   * posting), so query-time N/T = stats sums MINUS tombstone sums
   * with no separate stats mutation: ONE table append = atomic, and
   * re-tombstoning is a no-op (anti-join against existing
   * tombstones). Zero-token docs have no postings and contribute
   * n_toks = 0, which is exactly their T share.
   *
   * Caller contract: pass only ids that are actually in the index —
   * a never-appended id would decrement N for a doc that was never
   * counted. Searches exclude tombstoned docs immediately
   * ([[bm25TopKIndexed]]); [[compactLexIndex]] applies them
   * physically and FOLDS their N/T mass into one null-keyed aggregate
   * row (see there), after which the id may be re-appended. Appending
   * a STILL-tombstoned id is refused loudly
   * ([[StandingState.requireNotTombstoned]]). A rebuild clears
   * everything.
   *
   * Tombstone schema (r19): (doc_id, n_docs, n_toks) — `n_docs` is 1
   * per deleted doc, so the live-totals subtraction is `sum(n_docs)`/
   * `sum(n_toks)` and compaction can collapse the whole table to one
   * row with `doc_id = NULL` (null never matches the anti-join or the
   * re-append guard; the mass keeps subtracting). A pre-r19 table
   * (doc_id, n_toks) is migrated in place on the next call.
   */
  def tombstoneLexDocs(spark: SparkSession, base: String,
                       ids: DataFrame): Unit = {
    val t = s"${base}_tombstones"
    migrateTombstones(spark, base)
    val keyed = StandingState.keyedIds(ids, "doc_id")
    val fresh = StandingState.freshTombstones(spark, t, keyed, "doc_id")
    val withLen = fresh.as("f")
      .join(spark.table(s"${base}_postings").as("p"),
        col("f.doc_id") === col("p.doc_id"), "left")
      .groupBy(col("f.doc_id"))
      .agg(lit(1L).as("n_docs"),
        coalesce(max(col("p.len")), lit(0L)).as("n_toks"))
    StandingState.appendTombstones(spark, t, withLen)
  }

  /** Upgrade a pre-r19 (doc_id, n_toks) tombstone table to the
    * (doc_id, n_docs, n_toks) schema via the crash-safe staged swap.
    * No-op on the current schema or when no table exists. */
  private def migrateTombstones(spark: SparkSession, base: String): Unit = {
    val t = s"${base}_tombstones"
    if (spark.catalog.tableExists(t) &&
        !spark.table(t).columns.contains("n_docs")) {
      val staging = s"${t}_compacting"
      StandingState.stagedSwap(spark, t, staging) {
        spark.table(t)
          .select(col("doc_id"), lit(1L).as("n_docs"), col("n_toks"))
          .write.format("parquet").mode(SaveMode.Overwrite)
          .saveAsTable(staging)
      }
    }
  }

  /** The tombstone table in the current schema (old tables read as if
    * migrated), or None. */
  private def tombstones(spark: SparkSession, base: String): Option[DataFrame] = {
    val t = s"${base}_tombstones"
    if (!spark.catalog.tableExists(t)) None
    else {
      val raw = spark.table(t)
      Some(if (raw.columns.contains("n_docs")) raw
           else raw.select(col("doc_id"), lit(1L).as("n_docs"),
             col("n_toks")))
    }
  }

  /** The postings table minus tombstoned docs — every query's state
    * side; costs nothing when no tombstones exist. Folded (null-id)
    * rows carry only N/T mass and are skipped: their postings were
    * already dropped physically. */
  private def livePostings(spark: SparkSession, base: String): DataFrame = {
    val posts = spark.table(s"${base}_postings")
    tombstones(spark, base) match {
      case Some(t) => posts.join(
        broadcast(t.filter(col("doc_id").isNotNull).select(col("doc_id"))),
        Seq("doc_id"), "left_anti")
      case None => posts
    }
  }

  /** Corpus scalars (n_docs, n_toks): stats generations minus
    * tombstone contributions — equal BY CONSTRUCTION to the one-shot
    * aggregate over (accumulated corpus minus deleted docs). */
  private def liveTotals(spark: SparkSession, base: String): DataFrame = {
    val stats = spark.table(s"${base}_lexstats")
      .agg(sum(col("n_docs")).as("__sd"), sum(col("n_toks")).as("__st"))
    tombstones(spark, base) match {
      case Some(t) =>
        val dead = t.agg(coalesce(sum(col("n_docs")), lit(0L)).as("__dd"),
          coalesce(sum(col("n_toks")), lit(0L)).as("__dt"))
        stats.crossJoin(dead)
          .select((col("__sd") - col("__dd")).as("n_docs"),
            (col("__st") - col("__dt")).as("n_toks"))
      case None =>
        stats.select(col("__sd").as("n_docs"), col("__st").as("n_toks"))
    }
  }

  /**
   * Bucket-preserving postings compaction — [[AnnIndex.compactAnnIndex]]
   * verbatim over `_postings`: nightly appends accumulate per-bucket
   * small files; rewrite to exactly one file per bucket with NO
   * shuffle (the staging read pins the bucketed scan on, so each task
   * reads all of one bucket's files and the bucketed write emits one
   * file for it — see compactAnnIndex's Scaladoc for why a
   * `repartition` formulation silently fails to collapse), behind
   * [[StandingState.stagedSwap]]'s crash-safety window (r19: a crash
   * between the DROP and the RENAME is recovered on the next run by
   * promoting the staging table — see there).
   *
   * Tombstoned docs' postings are dropped here (searches already
   * excluded them logically), and the tombstone table is then FOLDED:
   * its N/T mass must keep subtracting from the stats generations —
   * which still count the deleted docs — but per-id rows no longer
   * serve any purpose once the postings are gone. The fold collapses
   * the table to ONE row (doc_id = NULL, Σn_docs, Σn_toks): query
   * scalars are unchanged at every crash point (the per-id rows and
   * the folded row subtract the same sums; the staged swap never has
   * both), the live-read anti-join stops growing with the dead set,
   * and a folded id may be RE-APPENDED exactly (its old generation
   * row and the fold cancel; the new append counts it once). Only a
   * rebuild resets the fold row.
   */
  def compactLexIndex(spark: SparkSession, base: String,
                      buckets: Int = 16): Unit = {
    migrateTombstones(spark, base)
    StandingState.compactBucketed(spark, s"${base}_postings",
      Seq("term"), buckets,
      livePostings(spark, base)
        .select(col("term"), col("doc_id"), col("tf"), col("len")))
    // fold: skip when nothing per-id remains (idempotent re-runs)
    tombstones(spark, base).foreach { t =>
      if (!t.filter(col("doc_id").isNotNull).isEmpty) {
        val tt = s"${base}_tombstones"
        StandingState.stagedSwap(spark, tt, s"${tt}_compacting") {
          spark.table(tt)
            .select(col("doc_id"), col("n_docs"), col("n_toks"))
            .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
              coalesce(sum(col("n_toks")), lit(0L)).as("n_toks"))
            .select(lit(null).cast("long").as("doc_id"),
              col("n_docs"), col("n_toks"))
            .coalesce(1)
            .write.format("parquet").mode(SaveMode.Overwrite)
            .saveAsTable(s"${tt}_compacting")
        }
      }
    }
  }

  /** Dead-mass fraction: not-yet-compacted tombstoned docs / live
    * docs. Folded (null-id) rows are already applied physically and
    * do not count. 0 with no tombstones. */
  def tombstoneFraction(spark: SparkSession, base: String): Double =
    tombstones(spark, base) match {
      case None => 0.0
      case Some(t) =>
        val dead = t.filter(col("doc_id").isNotNull).count()
        if (dead == 0L) 0.0
        else {
          val live = liveTotals(spark, base).head().getLong(0)
          if (live <= 0L) Double.PositiveInfinity
          else dead.toDouble / live.toDouble
        }
    }

  /**
   * Compact iff the tombstone mass crossed `maxDeadFraction` — the
   * [[AnnIndex.compactIfDead]] twin: deletes accumulate through
   * [[tombstoneLexDocs]] without moving any model-drift signal, this
   * notices when the dead set has grown past the policy bound (both
   * counts are cheap scalars) and [[compactLexIndex]] applies them
   * physically + folds the bookkeeping. Scores are bit-identical
   * before/after. Returns true when a compaction ran.
   */
  def compactIfDead(spark: SparkSession, base: String,
                    maxDeadFraction: Double = 0.3,
                    buckets: Int = 16): Boolean = {
    val dead = tombstoneFraction(spark, base) > maxDeadFraction
    if (dead) compactLexIndex(spark, base, buckets)
    dead
  }

  /**
   * BM25 top-k against the persisted postings — bit-identical to
   * [[CorpusStats.bm25TopK]] over the indexed corpus (LexIndexSpec),
   * with the corpus explode replaced by the bucket-pruned state scan
   * (see the object Scaladoc for the plan shape and why the scoring
   * inputs are equal). Output: q_id, rank (1..k), doc_id (the postings
   * table's id type), score_u — the per-call operator's exact schema,
   * so the two swap freely.
   *
   * The gated postings feed BOTH the df count and the scoring join; no
   * pin is needed (unlike the per-call plan, whose `posts` is an
   * expensive explode+aggregate) because each consumer re-reads only
   * the pruned buckets of a persisted table.
   */
  def bm25TopKIndexed(spark: SparkSession, queries: DataFrame,
                      qIdCol: String, qTextCol: String, base: String,
                      k: Int, dfCap: Double = 1.0,
                      collectVocab: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(dfCap > 0.0 && dfCap <= 1.0, s"dfCap must be in (0,1], got $dfCap")
    val qterms = queries.select(col(qIdCol).as("q_id"),
        explode(TextAnalysis.tokens(col(qTextCol))).as("term"))
      .distinct()
    // tombstone-aware state: deleted docs' postings are excluded (the
    // term gate pushes below the broadcast anti-join, so bucket
    // pruning is unaffected) and their N/T shares subtract from the
    // corpus scalars — scores equal a corpus that never held them
    val posts = livePostings(spark, base)
    val gated =
      if (collectVocab) {
        // driver-known vocabulary → isin predicate → bucket + row-group
        // pruning at the scan (the ivfPqTopKBucketed probed-cells move);
        // bounded by the probe batch's vocabulary
        val vocab = qterms.select(col("term")).distinct()
          .collect().map(_.getString(0)).toSeq
        if (vocab.isEmpty) posts.filter(lit(false))
        else posts.filter(col("term").isin(vocab: _*))
      } else
        // huge-vocabulary path: the gate, the idf table and the qterms
        // scoring join all scale WITH the probe vocabulary, so none of
        // them may be forced through a broadcast (r19, ADVICE fix —
        // the old path broadcast exactly the thing it existed to keep
        // unbounded). Plain joins: AQE still broadcasts when a side
        // turns out small, shuffles when it doesn't.
        posts.join(qterms.select(col("term")).distinct(), "term")
    // true corpus df per query term: the vocab gate keeps every posting
    // of a query term, so this count equals the per-call plan's
    val dfx = gated.groupBy("term").agg(count(lit(1)).as("df"))
    val tot = liveTotals(spark, base)
    def hinted(df: DataFrame): DataFrame =
      if (collectVocab) broadcast(df) else df
    val idf = dfx.crossJoin(broadcast(tot))
      .filter(col("df").cast("double")
        <= lit(dfCap) * col("n_docs").cast("double"))
      .select(col("term"),
        floor((log(col("n_docs").cast("double") * 2 + 2)
             - log(col("df").cast("double") * 2 + 1)) * lit(1e6) + lit(0.5))
          .cast("long").as("idf_u"),
        col("n_docs"), col("n_toks"))
    val contrib = gated
      .join(hinted(idf), "term")
      .join(hinted(qterms), "term")
      .select(col("q_id"), col("doc_id"),
        (col("idf_u").cast("decimal(8,0)") * lit(22)
           * col("tf").cast("decimal(10,0)")
           * col("n_toks").cast("decimal(16,0)")).as("__num"),
        (col("tf").cast("decimal(10,0)") * lit(10)
           * col("n_toks").cast("decimal(16,0)")
           + col("n_toks").cast("decimal(16,0)") * lit(3)
           + col("len").cast("decimal(10,0)") * lit(9)
           * col("n_docs").cast("decimal(16,0)")).as("__den"))
      .select(col("q_id"), col("doc_id"),
        expr("__num DIV __den").as("contrib_u"))
    val scored = contrib.groupBy("q_id", "doc_id")
      .agg(sum(col("contrib_u")).as("score_u"))
    val idType = posts.schema("doc_id").dataType
    scored.groupBy(col("q_id"))
      .agg(graft.plans.Kernels.topK(col("score_u").cast("double"),
        col("doc_id").cast("long"), lit(k)).as("__topk"))
      .select(col("q_id"), posexplode(col("__topk")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").cast(idType).as("doc_id"),
        col("col.score").cast("long").as("score_u"))
  }
}
