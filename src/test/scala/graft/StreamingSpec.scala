package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyCounts over a MemoryStream matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:55:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select("window_start", "event_type", "n", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got === Set(
        (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize closes sessions on gap and counts events (batch mode)") {
    import spark.implicits._
    // batch Dataset drives the same flatMapGroupsWithState logic
    val events = Seq(
      Event(1L, 1L, ts("2024-01-01 10:00:00")),
      Event(1L, 2L, ts("2024-01-01 10:10:00")),
      Event(1L, 3L, ts("2024-01-01 12:00:00")), // > 30min gap → new session
      Event(2L, 4L, ts("2024-01-01 09:00:00"))
    ).toDS()
    val out = EventStreams.sessionize(events, gapMs = 30 * 60 * 1000)
      .collect()
    // in batch mode only *closed* sessions are emitted (no timeout fires
    // for the trailing open session) — user 1's first session closes when
    // the 12:00 event arrives
    assert(out.toSeq === Seq(
      SessionOut(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L)))
  }

  test("microBatchUpsert: checkpoint is the watermark; reruns only ingest new files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mb").toString
    val src = s"$dir/src"; val tgt = s"$dir/fact"; val ckp = s"$dir/ckp"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    def transform(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("v", upper(col("v")))

    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("append").parquet(src)
    graft.streaming.EventStreams.microBatchUpsert(
      spark, src, schema, transform, tgt, Seq("k"), ckp)
    assert(spark.read.parquet(tgt).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "A", 2L -> "B"))

    // second run: only the new file is processed; key 2 is updated
    Seq((2L, "bb"), (3L, "c")).toDF("k", "v")
      .write.mode("append").parquet(src)
    graft.streaming.EventStreams.microBatchUpsert(
      spark, src, schema, transform, tgt, Seq("k"), ckp)
    assert(spark.read.parquet(tgt).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "A", 2L -> "BB", 3L -> "C"))

    // third run with no new data: a no-op
    graft.streaming.EventStreams.microBatchUpsert(
      spark, src, schema, transform, tgt, Seq("k"), ckp)
    assert(spark.read.parquet(tgt).count() === 3)
  }

  test("microBatchNearDedup: dedup-on-ingest against the signature state " +
    "equals one-shot dedup of all batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mbnd").toString
    val src = s"$dir/src"; val fact = s"$dir/fact"
    val state = s"$dir/state"; val ckp = s"$dir/ckp"
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select("doc_id", "text", "source")
    def run(): Unit = graft.streaming.EventStreams.microBatchNearDedup(
      spark, src, docs.schema, "doc_id", "text", fact, state, ckp,
      n = 3, k = 64, bands = 8, threshold = 0.5)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    // batches arrive in id order (ingest order); the stream dedups each
    // ON THE WAY IN against the accumulated signature state
    docs.filter(col("doc_id") < 250).write.mode("append").parquet(src)
    run()
    docs.filter(col("doc_id") >= 250).write.mode("append").parquet(src)
    run()

    val (oneShot, _) = graft.operators.Dedup.incrementalNearDedup(
      docs, "doc_id", "text", None, 3, 64, 8, 0.5)
    assert(ids(spark.read.parquet(fact)) === ids(oneShot),
      "streamed corpus must equal the one-shot dedup of all batches")
    // the state covers every processed doc (dropped ones shadow later
    // copies), and a rerun with no new files changes nothing
    assert(spark.read.parquet(state).count() === docs.count())
    val before = ids(spark.read.parquet(fact))
    run()
    assert(ids(spark.read.parquet(fact)) === before)
    graft.ops.materialize.releaseAll()
  }

  test("microBatchNearDedup gate: rejected docs enter neither corpus nor " +
    "state; streamed result equals one-shot gate-then-dedup") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("graft-mbcur").toString
    val src = s"$dir/src"; val fact = s"$dir/fact"
    val state = s"$dir/state"; val ckp = s"$dir/ckp"
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select("doc_id", "text", "source")
    // a real quality predicate: lexical diversity
    def gate(df: org.apache.spark.sql.DataFrame) =
      df.filter(TextAnalysis.typeTokenRatio(col("text")) >= 0.5)
    def run(): Unit = graft.streaming.EventStreams.microBatchNearDedup(
      spark, src, docs.schema, "doc_id", "text", fact, state, ckp,
      n = 3, k = 64, bands = 8, threshold = 0.5, gate = gate)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    docs.filter(col("doc_id") < 250).write.mode("append").parquet(src)
    run()
    docs.filter(col("doc_id") >= 250).write.mode("append").parquet(src)
    run()

    val gatedAll = gate(docs)
    assert(gatedAll.count() < docs.count(), "gate must actually reject")
    val (oneShot, _) = graft.operators.Dedup.incrementalNearDedup(
      gatedAll, "doc_id", "text", None, 3, 64, 8, 0.5)
    assert(ids(spark.read.parquet(fact)) === ids(oneShot),
      "streamed curation must equal one-shot gate-then-dedup")
    // rejected docs never reached the signature state either
    assert(spark.read.parquet(state).count() === gatedAll.count())
    assert(ids(spark.read.parquet(state)).subsetOf(ids(gatedAll)))
    graft.ops.materialize.releaseAll()
  }

  test("microBatchUpsert with a partitioned fact leaves untouched " +
    "partitions' files alone across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mbp").toString
    val src = s"$dir/src"; val tgt = s"$dir/fact"; val ckp = s"$dir/ckp"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, day INT, v STRING")
    def run(): Unit = graft.streaming.EventStreams.microBatchUpsert(
      spark, src, schema, identity, tgt, Seq("k", "day"), ckp,
      partitionBy = Seq("day"))

    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "day", "v")
      .write.mode("append").parquet(src)
    run()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val day10Before = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$tgt/day=10")).toSeq
      .filter(_.isFile).map(s => (s.getPath.getName, s.getModificationTime))

    // the second micro-batch touches only day=20
    Seq((2L, 20, "B!"), (3L, 20, "c")).toDF("k", "day", "v")
      .write.mode("append").parquet(src)
    run()
    assert(spark.read.parquet(tgt).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "a", 2L -> "B!", 3L -> "c"))
    val day10After = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$tgt/day=10")).toSeq
      .filter(_.isFile).map(s => (s.getPath.getName, s.getModificationTime))
    assert(day10After === day10Before,
      "day=10 files must be byte-identical after a day=20-only batch")
  }

  test("sessionizeWindows: built-in session_window splits on the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.sessionizeWindows(df, gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:10:00"), 1L),   // same session
        (ts("2024-01-01 12:00:00"), 1L),   // > 30 min gap → new session
        (ts("2024-01-01 09:00:00"), 2L))
      q.processAllAvailable()
      // append mode finalizes sessions only once the watermark passes
      // them — push it with a later batch (the streaming clock is data)
      mem.addData((ts("2024-01-02 00:00:00"), 99L))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .filter("user_id != 99")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3))).toSet
      assert(got === Set(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L),
        (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00"), 1L),
        (2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00"), 1L)))
    } finally q.stop()
  }

  test("enrichWithinInterval joins two streams inside the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Timestamp, Long, String)]
    val lk = MemoryStream[(Timestamp, Long, String)]
    val events = ev.toDF().toDF("ts", "user_id", "action")
    val lookups = lk.toDF().toDF("rts", "user_id", "segment")
    val q = EventStreams.enrichWithinInterval(events, lookups,
        key = "user_id", eventTs = "ts", lookupTs = "rts",
        within = "15 minutes")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      lk.addData(
        (ts("2024-01-01 09:50:00"), 1L, "gold"),    // 10 min before → joins
        (ts("2024-01-01 09:00:00"), 1L, "stale"),   // 60 min before → outside
        (ts("2024-01-01 10:05:00"), 1L, "future"),  // after the event → outside
        (ts("2024-01-01 09:55:00"), 2L, "silver"))  // other key
      ev.addData(
        (ts("2024-01-01 10:00:00"), 1L, "checkout"),
        (ts("2024-01-01 10:00:00"), 3L, "browse"))  // no lookup → dropped (inner)
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("user_id", "action", "segment").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set((1L, "checkout", "gold")))
    } finally q.stop()
  }

  test("dedupedByKey drops later duplicates of the same key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_no", "payload")
    val q = EventStreams.dedupedByKey(df, "doc_no")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L, "first"),
        (ts("2024-01-01 10:01:00"), 1L, "retry"),
        (ts("2024-01-01 10:02:00"), 2L, "other"))
      q.processAllAvailable()
      val got = spark.table("deduped").collect()
        .map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(got === Map(1L -> "first", 2L -> "other"))
    } finally q.stop()
  }

  test("index maintain soak: streamed appends run under the frozen model, " +
    "a drifted batch trips the policy MID-STREAM, the rebuild restores " +
    "the baseline and the recall floor") {
    import spark.implicits._
    import graft.operators.{AnnIndex, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val Base = "mstate"; val Corpus = "mcorpus"
    val dir = java.nio.file.Files.createTempDirectory("graft-soak").toString
    for (t <- Seq(s"${Base}_centroids", s"${Base}_codebooks",
        s"${Base}_codes", s"${Base}_stats", s"${Base}_maintenance", Corpus)) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    // gen-0: index + corpus table seeded from 80% of the fixture — wide
    // enough that in-distribution holdouts reconstruct near the gen-0
    // baseline (a tiny seed would overfit its PQ codebooks and trip the
    // policy on HEALTHY appends). Production config m=16/pqK=16 so the
    // recall floor is meaningful.
    val seed = e.filter(col("vec_id") % 5 =!= 0)
    AnnIndex.writeAnnIndex(seed, "vec_id", "embedding", Base, dim = 64,
      nCentroids = 8, m = 16, pqK = 16, buckets = 4)
    seed.write.format("parquet").saveAsTable(Corpus)
    val (cents0, model0) = AnnIndex.readModel(spark, Base)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Array[Float])] =
      df.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // wave 1: in-distribution appends — the policy must NOT trip
    val holdout = e.filter(col("vec_id") % 5 === 0)
    val wave1 = rows(holdout.filter(col("vec_id") < 250))
    // wave 2: the embedding-model-swap drift shape (rescale + offset,
    // per the staleness spec) — reconstruction error under the frozen
    // codebooks jumps, and the policy must trip on THIS batch
    val wave2 = rows(holdout.filter(col("vec_id") >= 250)).map {
      case (id, v) => (id, v.map(x => x * 0.2f + 0.4f))
    }
    assert(wave1.nonEmpty && wave2.nonEmpty)

    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
    val q = EventStreams.microBatchIndexMaintain(stream, "vec_id",
      "embedding", Base, Corpus, s"$dir/ckp", dim = 64, nCentroids = 8,
      m = 16, pqK = 16, buckets = 4, maxRatio = 1.25)
    try {
      mem.addData(wave1: _*)
      q.processAllAvailable()
      // healthy append: no rebuild, and the model is BIT-identical to
      // gen-0 — the normal path re-fit nothing and re-read no history
      val (c1, m1) = AnnIndex.readModel(spark, Base)
      assert(c1 === cents0)
      assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
        model0.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

      mem.addData(wave2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // the maintenance log written BY THE STREAM shows the policy
    // tripping mid-stream: wave 1 appended without rebuilding, wave 2's
    // drifted ratio crossed 1.25 and rebuilt — exactly once overall
    val log = spark.table(s"${Base}_maintenance")
      .orderBy("batch_id")
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("appended"), r.getAs[Double]("ratio"),
        r.getAs[Boolean]("rebuilt")))
    assert(log.length === 2, log.mkString("; "))
    assert(log(0)._2 === wave1.size && !log(0)._4,
      s"wave 1 must append without rebuilding: ${log(0)}")
    assert(log(1)._2 === wave2.size && log(1)._4 && log(1)._3 > 1.25,
      s"wave 2 must trip the policy and rebuild: ${log(1)}")

    // rebuild restored the baseline (fresh gen-0, no appended gens) and
    // refit the model over the full corpus (centroids moved)
    assert(AnnIndex.staleness(spark, Base).ratio === 1.0)
    val (c2, _) = AnnIndex.readModel(spark, Base)
    assert(c2 !== cents0, "rebuild must refit over the drifted corpus")
    // the corpus table holds every generation exactly once
    assert(spark.table(Corpus).count() === e.count())
    assert(spark.table(s"${Base}_codes").count() === e.count())

    // recall recovered, measured against exact L2 over the full
    // corpus — the same post-rebuild bar as AnnIndexSpec's drift test
    val corpus = spark.table(Corpus)
    val q10 = corpus.filter(col("vec_id") < 10)
    val approx = AnnIndex.ivfPqTopKBucketed(spark, q10, "vec_id",
      "embedding", k = 5, Base, nProbe = 6)
      .select("query_id", "neighbor_id")
    val exact = Similarity.l2TopK(corpus, q10, "vec_id", "embedding",
      k = 5).select("query_id", "neighbor_id")
    val total = exact.count()
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    assert(total > 0 && hits.toDouble / total >= 0.3,
      s"post-rebuild recall ${hits.toDouble / total} below floor")
    // and the refit index is no longer blind to the drifted family:
    // a drifted query's nearest neighbors ARE drifted vectors (they
    // form a tight, far-offset cluster), and the rebuilt cells +
    // codebooks must place them together
    val driftedIds = wave2.map(_._1).toSet
    val dNeighbors = AnnIndex.ivfPqTopKBucketed(spark,
        corpus.filter(col("vec_id").isin(driftedIds.take(10).toSeq: _*)),
        "vec_id", "embedding", k = 5, Base, nProbe = 6)
      .select("neighbor_id").collect().map(_.getLong(0))
    val driftedFrac = dNeighbors.count(driftedIds.contains).toDouble /
      dNeighbors.length
    assert(dNeighbors.nonEmpty && driftedFrac >= 0.8,
      s"drifted queries must resolve to drifted neighbors, got $driftedFrac")
  }

  test("microBatchIndexAppend: streamed batches extend the persisted ANN " +
    "index with the frozen model; searches see them immediately") {
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-mbann").toString
    val src = s"$dir/src"; val ckp = s"$dir/ckp"
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    val e1 = e.filter(col("vec_id") % 3 =!= 0)
    val e2 = e.filter(col("vec_id") % 3 === 0)
    // clean slate for the bucketed tables (shared warehouse across suites)
    for (t <- Seq("sstate_centroids", "sstate_codebooks", "sstate_codes")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val pth = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(pth, true)
    }
    // one-time build over the seed corpus = the frozen model
    AnnIndex.writeAnnIndex(e1, "vec_id", "embedding", "sstate", dim = 64,
      nCentroids = 8, m = 8, pqK = 8, buckets = 4)
    val (cents, model) = AnnIndex.readModel(spark, "sstate")
    // stream the rest in two micro-batch waves
    e2.filter(col("vec_id") < 300).write.mode("append").parquet(src)
    graft.streaming.EventStreams.microBatchIndexAppend(spark, src,
      e.schema, "vec_id", "embedding", "sstate", ckp, buckets = 4)
    e2.filter(col("vec_id") >= 300).write.mode("append").parquet(src)
    graft.streaming.EventStreams.microBatchIndexAppend(spark, src,
      e.schema, "vec_id", "embedding", "sstate", ckp, buckets = 4)
    // the drift signal must see the streamed appends: the batch is
    // materialized BEFORE the codes append, so its anti-join against
    // the codes table cannot re-evaluate to empty post-append and
    // record n=0 stats (which would silently disable rebuildIfStale
    // for the streaming path — the primary integration of the metric)
    val stAfter = AnnIndex.staleness(spark, "sstate")
    assert(stAfter.appendedRows === e2.count(),
      s"streamed appends must record their fit stats; saw " +
        s"${stAfter.appendedRows} of ${e2.count()} appended rows")
    // the codes table now holds exactly the frozen-model encoding of
    // the FULL corpus — streamed appends never re-fit or rewrite
    def enc(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet
    assert(enc(spark.table("sstate_codes")
        .select("neighbor_id", "centroid_id", "codes")) ===
      enc(AnnIndex.encodeCorpus(e, "vec_id", "embedding", cents, model)))
    // a checkpointed rerun with no new files is a no-op
    val n0 = spark.table("sstate_codes").count()
    graft.streaming.EventStreams.microBatchIndexAppend(spark, src,
      e.schema, "vec_id", "embedding", "sstate", ckp, buckets = 4)
    assert(spark.table("sstate_codes").count() === n0)
    // at-least-once redelivery (crash between append commit and
    // checkpoint write): wiping the checkpoint replays EVERY source
    // file as a fresh batch — the already-indexed anti-join must make
    // the replay a no-op instead of duplicating the codes table
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckp))
    graft.streaming.EventStreams.microBatchIndexAppend(spark, src,
      e.schema, "vec_id", "embedding", "sstate", ckp, buckets = 4)
    assert(spark.table("sstate_codes").count() === n0,
      "redelivered batches must not duplicate index rows")
    // appended vectors are immediately searchable
    val hits = AnnIndex.ivfPqTopKBucketed(spark,
        e2.filter(col("vec_id") < 30), "vec_id", "embedding", k = 5,
        "sstate", nProbe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty)
  }
  test("microBatchLexAppend: streamed batches extend the standing lexical " +
    "index exactly once; zero-token docs count once in N") {
    import graft.operators.LexIndex
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mblex").toString
    val src = s"$dir/src"; val ckp = s"$dir/ckp"
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select("doc_id", "text")
    val seed = d.filter(col("doc_id") % 3 =!= 0)
    val wave1 = d.filter(col("doc_id") % 3 === 0 && col("doc_id") < 250)
      .unionByName(Seq((910001L, "")).toDF("doc_id", "text"))
    val wave2 = d.filter(col("doc_id") % 3 === 0 && col("doc_id") >= 250)
    for (t <- Seq("lexstream_postings", "lexstream_lexstats")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val pth = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(pth, true)
    }
    LexIndex.writeLexIndex(seed, "doc_id", "text", "lexstream", 4)
    wave1.write.mode("append").parquet(src)
    graft.streaming.EventStreams.microBatchLexAppend(spark, src,
      wave1.schema, "doc_id", "text", "lexstream", ckp, buckets = 4)
    wave2.write.mode("append").parquet(src)
    graft.streaming.EventStreams.microBatchLexAppend(spark, src,
      wave2.schema, "doc_id", "text", "lexstream", ckp, buckets = 4)
    // the streamed index now answers BIT-IDENTICALLY to a one-shot
    // per-call run over the accumulated corpus (incl. the zero-token
    // doc in N)
    val all = seed.unionByName(wave1).unionByName(wave2)
    val probes = d.filter(col("doc_id") % 23 === 0)
    def page(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val streamed = page(LexIndex.bm25TopKIndexed(spark, probes,
      "doc_id", "text", "lexstream", 5))
    val oneShot = page(graft.operators.CorpusStats.bm25TopK(all,
      "doc_id", "text", probes, "doc_id", "text", 5))
    assert(streamed === oneShot)
    assert(streamed.nonEmpty)
    // checkpointed rerun with no new files: a no-op on both tables
    val nPost = spark.table("lexstream_postings").count()
    val nDocs = spark.table("lexstream_lexstats")
      .agg(sum("n_docs")).head().getLong(0)
    graft.streaming.EventStreams.microBatchLexAppend(spark, src,
      wave2.schema, "doc_id", "text", "lexstream", ckp, buckets = 4)
    assert(spark.table("lexstream_postings").count() === nPost)
    assert(spark.table("lexstream_lexstats")
      .agg(sum("n_docs")).head().getLong(0) === nDocs,
      "redelivery must not double-count N (zero-token docs included)")
  }
}
