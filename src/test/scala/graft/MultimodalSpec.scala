package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.syntheticMedia(spark,
    Tables.load(spark, "/root/testdata/sf0.001", "documents"))

  test("syntheticMedia conforms to the canonical media schema") {
    // simpleString compares names+types, ignoring inferred nullability
    assert(media.schema.simpleString === Multimodal.mediaSchema.simpleString)
  }

  test("extractFeatures: one fixed-dim feature row per media item, deterministic") {
    val f1 = Multimodal.extractFeatures(media)
    assert(f1.count() === media.count())
    val dims = f1.select(size(col("features"))).distinct().collect()
      .map(_.getInt(0)).toSeq
    assert(dims === Seq(Multimodal.featureDim))
    // deterministic across runs and partitionings
    val a = f1.orderBy("media_id").collect().map(_.getSeq[Float](2))
    val b = Multimodal.extractFeatures(media.repartition(7))
      .orderBy("media_id").collect().map(_.getSeq[Float](2))
    assert(a.toSeq === b.toSeq)
  }

  test("sampleFrames: video rows fan out by duration, others drop") {
    val frames = Multimodal.sampleFrames(media, fps = 1.0)
    val byKind = frames.join(media.select(col("media_id"), col("kind")),
      "media_id").groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet === Set("video"))
    // one video item's frame count matches duration_ms/1000 * fps
    val one = media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms")).first()
    val expected = math.max(1, one.getLong(1) / 1000)
    assert(frames.filter(col("media_id") === one.getLong(0)).count() === expected)
  }

  test("resizedMeta: pure-column resize bookkeeping, aspect preserved") {
    import spark.implicits._
    val m = Multimodal.syntheticMedia(spark,
      Seq((3839L, "x")).toDF("doc_id", "text")) // width 1920 → scale 0.5
    val r = Multimodal.resizedMeta(m, maxSide = 960).first()
    assert(r.getAs[Int]("new_width") === 960)
  }

  test("audioSegments: audio-only fan-out, hop schedule, truncated tail") {
    import spark.implicits._
    // doc_id 1 → audio, duration (1 % 30)*1000+1000 = 2000 ms
    val m = Multimodal.syntheticMedia(spark,
      Seq((1L, "audio doc"), (2L, "video doc"), (3L, "image doc"))
        .toDF("doc_id", "text"))
    val segs = Multimodal.audioSegments(m, windowMs = 1500, hopMs = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // only the audio row fans out; 2000ms at 1s hop → 2 segments,
    // second truncated at the clip end
    assert(segs.toSeq === Seq((1L, 0, 0L, 1500L), (1L, 1, 1000L, 2000L)))
  }

  test("metadata-only ops never read the content blob (column pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(s"$dir/media")
    val plan = Multimodal.resizedMeta(spark.read.parquet(s"$dir/media"), 512)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("content"), readSchema)
  }
}
