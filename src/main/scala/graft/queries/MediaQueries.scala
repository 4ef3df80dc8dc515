package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/**
 * Multimodal query set: binary media columns with typed metadata,
 * synthesized deterministically from the documents corpus (no media
 * fixtures exist in this environment; the decode step is a documented
 * stub — see [[Multimodal]]). Rows-only driver checks; shapes and
 * determinism are covered by MultimodalSpec.
 */
object MediaQueries {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q50_media_features",
      (s, dir) => Multimodal.extractFeatures(
        Multimodal.syntheticMedia(s, Tables.load(s, dir, "documents"))),
      None,
      "partition-local batch feature extraction over binary media"),

    QuerySpec("q51_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.syntheticMedia(s, Tables.load(s, dir, "documents")),
        fps = 1.0),
      None,
      "video frame sampling fan-out (executor-side, driver never sees frames)"),

    QuerySpec("q52_media_resize_meta",
      (s, dir) => Multimodal.resizedMeta(
        Multimodal.syntheticMedia(s, Tables.load(s, dir, "documents")),
        maxSide = 512),
      None,
      "metadata-only resize bookkeeping — blob column pruned at scan")
  )
}
