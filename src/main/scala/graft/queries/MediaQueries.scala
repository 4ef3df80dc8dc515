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
 * Registered outputs are scalar-only (hash + size of the feature
 * arrays) so the driver's row-sorting compare can hash them; the raw
 * `array<float>` outputs stay covered by MultimodalSpec. q52 is pure
 * metadata arithmetic and carries a full DuckDB oracle.
 */
object MediaQueries {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q50_media_features",
      (s, dir) => Multimodal.extractFeatures(
          Multimodal.syntheticMedia(s, Tables.load(s, dir, "documents")))
        .select(col("media_id"), col("kind"),
          size(col("features")).as("feat_dim"),
          xxhash64(col("features")).as("feat_hash")),
      None,
      "partition-local batch feature extraction over binary media " +
        "(scalar digest of the feature vector; arrays checked in specs)"),

    QuerySpec("q51_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.syntheticMedia(s, Tables.load(s, dir, "documents")),
          fps = 1.0)
        .select(col("media_id"), col("frame_idx"),
          size(col("frame_features")).as("feat_dim"),
          xxhash64(col("frame_features")).as("feat_hash")),
      None,
      "video frame sampling fan-out (executor-side, driver never sees " +
        "frames; scalar digest per frame)"),

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
        "posexplode fan-out, blob column pruned, last window truncated")
  )
}
