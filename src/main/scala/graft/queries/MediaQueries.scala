package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/**
 * Multimodal query set: binary media columns with typed metadata,
 * synthesized deterministically from the documents corpus (no media
 * fixtures exist in this environment; the decode step is a documented
 * stub — see [[Multimodal]]).
 *
 * Registered outputs are scalar-only so the driver's row-sorting
 * compare can hash them. q50/q51 carry FULL oracles via the
 * dumped-model pattern (the same trick that oracles q113/q122): the
 * binary decode itself can't be expressed in SQL, so the query dumps
 * the decoded per-media feature rows keyed by the corpus fingerprint
 * and the oracle REPLAYS everything downstream of the decode — the
 * media_id/kind derivation and the row universe from the real
 * `documents` table (so dropped/duplicated rows are caught), the
 * per-frame fan-out and the float32 `f0 + frame_idx` arithmetic in
 * DuckDB — and verifies all 16 feature elements bit-exactly as
 * scalar float columns. q52/q76 are pure metadata arithmetic with
 * direct oracles.
 */
object MediaQueries {

  /** Dump the decoded feature table for the oracle, keyed (n, fp) by
    * the documents corpus so each SF's static SQL finds its own dump
    * (same atomicity story as [[VectorQueries.dumpOracle]]). */
  private def dumpFeatures(s: org.apache.spark.sql.SparkSession,
                           docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(s, docs))
    // (count, id+byte-length sum): like VectorQueries.corpusKey, the
    // fingerprint must see VALUES — sf0.001 and sf0.01 documents share
    // ids 0..499, and an id-only key let one SF's dump shadow the
    // other's. Byte length is exact integer arithmetic in both engines
    // (octet_length here, strlen in DuckDB).
    val (kn, kfp) = VectorQueries.snapshotKey(docs, "mediakey") {
      val r = docs.agg(count(lit(1)),
        sum(col("doc_id").cast("long") +
          octet_length(col("text")).cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }
    VectorQueries.dumpOracle(feats, "media_features", kn, kfp)
    feats
  }

  private val featCols = (0 until Multimodal.featureDim)
    .map(i => f"f$i%02d")

  private val oracleFeatCte = """
        WITH nn AS (SELECT count(*) AS n,
                           sum(CAST(doc_id AS BIGINT) +
                               CAST(strlen(text) AS BIGINT)) AS fp
                    FROM documents),
        feat AS (
          SELECT media_id, features
          FROM read_parquet('/tmp/graft_ann_oracle/media_features/*/*/*.parquet',
                            hive_partitioning = true)
          WHERE n = (SELECT n FROM nn) AND fp = (SELECT fp FROM nn))"""

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q50_media_features",
      (s, dir) => {
        val feats = dumpFeatures(s, Tables.load(s, dir, "documents"))
        feats.select(col("media_id") +: col("kind") +:
          size(col("features")).as("feat_dim") +:
          featCols.zipWithIndex.map { case (c, i) =>
            element_at(col("features"), i + 1).as(c)
          }: _*)
      },
      Some(oracleFeatCte + s"""
        SELECT d.doc_id AS media_id,
               CASE CAST(d.doc_id % 3 AS INTEGER)
                 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               END AS kind,
               CAST(len(f.features) AS INTEGER) AS feat_dim,
               ${featCols.zipWithIndex.map { case (c, i) =>
                 s"f.features[${i + 1}] AS $c" }.mkString(", ")}
        FROM documents d JOIN feat f ON f.media_id = d.doc_id"""),
      "partition-local batch feature extraction over binary media; " +
        "oracle joins the dumped decode output back to documents and " +
        "verifies row universe, kind mapping, and all 16 elements"),

    QuerySpec("q51_frame_sample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        dumpFeatures(s, docs) // per-media base features for the oracle
        Multimodal.sampleFrames(Multimodal.syntheticMedia(s, docs), fps = 1.0)
          .select(col("media_id") +: col("frame_idx") +:
            size(col("frame_features")).as("feat_dim") +:
            featCols.zipWithIndex.map { case (c, i) =>
              element_at(col("frame_features"), i + 1).as(c)
            }: _*)
      },
      Some(oracleFeatCte + s""",
        v AS (SELECT doc_id AS media_id,
                     CAST(doc_id % 30 AS BIGINT) + 1 AS nf
              FROM documents WHERE doc_id % 3 = 2),
        s AS (SELECT media_id,
                     unnest(generate_series(0, nf - 1)) AS fi FROM v)
        SELECT s.media_id, CAST(s.fi AS INTEGER) AS frame_idx,
               CAST(len(f.features) AS INTEGER) AS feat_dim,
               CAST(f.features[1] + CAST(s.fi AS FLOAT) AS FLOAT) AS f00,
               ${featCols.zipWithIndex.drop(1).map { case (c, i) =>
                 s"f.features[${i + 1}] AS $c" }.mkString(", ")}
        FROM s JOIN feat f ON f.media_id = s.media_id"""),
      "video frame sampling fan-out (executor-side, driver never sees " +
        "frames); oracle replays the frame schedule from duration_ms " +
        "and the float32 f0+frame_idx variation from the dumped decode"),

    QuerySpec("q52_media_resize_meta",
      (s, dir) => Multimodal.resizedMeta(
        Multimodal.syntheticMedia(s, Tables.load(s, dir, "documents")),
        maxSide = 512),
      Some("""
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               END AS kind,
               CAST(TRUNC((doc_id % 1920 + 1) *
                 LEAST(CAST(1.0 AS DOUBLE),
                       512 / GREATEST(doc_id % 1920 + 1, doc_id % 1080 + 1)))
                 AS INTEGER) AS new_width,
               CAST(TRUNC((doc_id % 1080 + 1) *
                 LEAST(CAST(1.0 AS DOUBLE),
                       512 / GREATEST(doc_id % 1920 + 1, doc_id % 1080 + 1)))
                 AS INTEGER) AS new_height
        FROM documents"""),
      "metadata-only resize bookkeeping — blob column pruned at scan"),

    QuerySpec("q76_audio_segments",
      (s, dir) => Multimodal.audioSegments(
        Multimodal.syntheticMedia(s, Tables.load(s, dir, "documents")),
        windowMs = 1500, hopMs = 1000),
      Some("""
        WITH m AS (
          SELECT doc_id AS media_id, (doc_id % 30) * 1000 + 1000 AS dur
          FROM documents WHERE doc_id % 3 = 1),
        s AS (
          SELECT media_id, dur,
            unnest(generate_series(0,
              CAST(ceil(CAST(dur AS DOUBLE) / 1000) AS BIGINT) - 1)) AS seg
          FROM m)
        SELECT media_id,
               CAST(seg AS INTEGER) AS segment_idx,
               seg * 1000 AS start_ms,
               least(seg * 1000 + 1500, dur) AS end_ms
        FROM s"""),
      "audio windowing schedule (1.5s windows, 1s hop): sequence + " +
        "posexplode fan-out, blob column pruned, last window truncated"),

    QuerySpec("q128_audio_decode",
      (s, dir) => Multimodal.audioDecodeStats(
        Multimodal.syntheticWavMedia(Tables.load(s, dir, "documents"))),
      Some("""
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST((doc_id % 50 + 1) * 80 AS BIGINT) AS n_samples,
               CAST((doc_id % 50 + 1) * 10 AS BIGINT) AS duration_ms,
               CAST((doc_id % 100) * 300 AS BIGINT) AS rms_int
        FROM documents"""),
      "REAL WAV decode (javax.sound.sampled, zero new deps): every doc " +
        "becomes a deterministic 8 kHz PCM16 clip executor-side, the " +
        "engine round-trips encode→container parse→PCM read, and the " +
        "oracle replays sample count / duration / integer-exact RMS " +
        "from doc_id arithmetic — a wrong byte anywhere in the codec " +
        "path breaks the hash")
  )
}
