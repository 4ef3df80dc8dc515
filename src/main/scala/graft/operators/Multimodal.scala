package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column support: image/audio/video as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract /
 * frame-sample operators.
 *
 * The Spark-side plumbing is real — schema, partition-local batch
 * processing via `mapPartitions` (the JVM analog of `mapInPandas`
 * batching: one buffer per partition, streaming iterator, no
 * per-row setup cost), deterministic output shapes. IMAGE decode and
 * resize are REAL — the JDK's built-in `javax.imageio` handles
 * PNG/JPEG/GIF/BMP with zero added dependencies ([[decodeImage]],
 * [[resizeImage]]). Audio/video codec work stays STUBBED
 * (`fakeDecode`) because no such libraries exist in this environment:
 * the stub derives deterministic pseudo-features from the content
 * bytes, so every pipeline stage around the decode is testable and the
 * stub swaps for a real codec without touching plans.
 */
object Multimodal {

  /** Canonical media-table schema: content stays an opaque binary blob;
    * everything queryable lives in typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  val featureDim = 16

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG,
    * JPEG, GIF, BMP — zero new dependencies): returns (width, height,
    * 4×4 mean-luminance grid as the 16-dim feature vector), or None
    * when the bytes are not a decodable image. Executor-side only. */
  private[graft] def decodeImage(content: Array[Byte])
      : Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val grid = 4
        val out = new Array[Float](featureDim)
        var gy = 0
        while (gy < grid) {
          var gx = 0
          while (gx < grid) {
            val x0 = gx * w / grid
            val x1 = math.max(x0 + 1, (gx + 1) * w / grid)
            val y0 = gy * h / grid
            val y1 = math.max(y0 + 1, (gy + 1) * h / grid)
            var sum = 0.0; var n = 0
            var y = y0
            while (y < y1 && y < h) {
              var x = x0
              while (x < x1 && x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
                n += 1; x += 1
              }
              y += 1
            }
            out(gy * grid + gx) = if (n == 0) 0f else (sum / n).toFloat
            gx += 1
          }
          gy += 1
        }
        Some((w, h, out))
      }
      // ImageIO plugins throw RuntimeExceptions (ArrayIndexOutOfBounds,
      // IllegalArgument) on malformed bytes, not just IOException — any
      // undecodable row must take the documented fallback, never fail
      // the Spark task
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image resize via `java.awt` bilinear scaling, re-encoded as
    * PNG bytes. None when the input is not a decodable image. */
  private[graft] def resizeImage(content: Array[Byte], maxSide: Int)
      : Option[(Int, Int, Array[Byte])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val nw = math.max(1, (w * scale).toInt)
        val nh = math.max(1, (h * scale).toInt)
        val scaled = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = scaled.createGraphics()
        try {
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, nw, nh, null)
        } finally g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(scaled, "png", bos)
        Some((nw, nh, bos.toByteArray))
      }
      // same reasoning as decodeImage: malformed bytes → fallback path
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decode for audio/video (and non-image bytes) — deterministic
    * pseudo-features from the content bytes. No audio/video codec
    * exists in this environment; the signature (bytes → fixed-dim float
    * features) is the swap-in contract. Image bytes take the REAL
    * [[decodeImage]] path in [[extractFeatures]]. */
  private[operators] def fakeDecode(content: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    var h = 1125899906842597L // deterministic seed
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    var d = 0
    while (d < featureDim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 40).toInt % 1000) / 1000.0f
      d += 1
    }
    out
  }

  private val featuresSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /**
   * Batch feature extraction: one decode per media item, executed
   * partition-locally. Returns (media_id, kind, features float[16]).
   * Image rows decode for REAL through `javax.imageio`
   * ([[decodeImage]]); bytes that aren't a decodable image — and all
   * audio/video rows — fall back to the deterministic stub, so
   * synthetic fixtures keep their digests. Rows with null content are
   * dropped (a real pipeline would route them to a dead-letter sink).
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featuresSchema)
    media.select("media_id", "kind", "content")
      .mapPartitions { rows =>
        rows.filter(!_.isNullAt(2)).map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val feats =
            if (r.getString(1) == "image")
              decodeImage(content).map(_._3).getOrElse(fakeDecode(content))
            else fakeDecode(content)
          Row(r.getLong(0), r.getString(1), feats.toSeq)
        }
      }(enc)
  }

  /**
   * REAL image resize: for decodable image rows, re-encode at
   * `maxSide` via bilinear AWT scaling and emit the new bytes +
   * actual dimensions; undecodable/non-image rows are dropped.
   * Compose with [[resizedMeta]] when only the bookkeeping is needed
   * (that path never reads the blob).
   */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "kind", "content")
      .mapPartitions { rows =>
        rows.filter(r => r.getString(1) == "image" && !r.isNullAt(2))
          .flatMap { r =>
            resizeImage(r.getAs[Array[Byte]]("content"), maxSide).map {
              case (w, h, bytes) => Row(r.getLong(0), w, h, bytes)
            }
          }
      }(enc)
  }

  /**
   * Frame sampling for video rows: emit one row per sampled frame at
   * `fps` frames/sec of `meta.duration_ms`, each with frame-level
   * features (stub: content hash + frame index). Output:
   * (media_id, frame_idx, frame_features). Non-video rows produce no
   * frames. The per-frame fan-out happens executor-side — the driver
   * never sees frame counts.
   */
  def sampleFrames(media: DataFrame, fps: Double = 1.0): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select(col("media_id"), col("kind"), col("content"),
        col("meta.duration_ms").as("duration_ms"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.getString(1) != "video" || r.isNullAt(2) || r.isNullAt(3)) {
            Iterator.empty
          } else {
            val content = r.getAs[Array[Byte]]("content")
            val nFrames = math.max(1,
              (r.getLong(3) / 1000.0 * fps).toInt)
            val base = fakeDecode(content)
            (0 until nFrames).iterator.map { f =>
              val feats = base.clone()
              feats(0) = feats(0) + f // deterministic per-frame variation
              Row(r.getLong(0), f, feats.toSeq)
            }
          }
        }
      }(enc)
  }

  /**
   * Audio segmentation bookkeeping: one row per fixed-`windowMs` window
   * at `hopMs` hop over `meta.duration_ms`, for audio rows — the
   * schedule a feature extractor (or a real codec) consumes. Pure
   * column expressions: `sequence` + `posexplode` fan out executor-side
   * with the blob column pruned away entirely; the last window
   * truncates at the clip end. Compose with [[extractFeatures]] when
   * the segment bytes themselves need decoding.
   */
  def audioSegments(media: DataFrame, windowMs: Long = 1500,
                    hopMs: Long = 1000): DataFrame = {
    require(windowMs > 0 && hopMs > 0, "window and hop must be positive")
    val dur = col("meta.duration_ms")
    media.filter(col("kind") === "audio" && dur.isNotNull && dur > 0)
      .select(col("media_id"), dur.as("dur"),
        posexplode(sequence(lit(0L),
          ceil(dur.cast("double") / hopMs).cast("long") - 1)))
      .select(col("media_id"),
        col("pos").as("segment_idx"),
        (col("col") * hopMs).as("start_ms"),
        least(col("col") * hopMs + windowMs, col("dur")).as("end_ms"))
  }

  /** Declarative metadata ops need no decode at all — e.g. resize
    * bookkeeping is pure column arithmetic on `meta`, executed codegen'd
    * with the blob column never read (column pruning drops `content`). */
  def resizedMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h))
    media.select(col("media_id"), col("kind"),
      (w * scale).cast("int").as("new_width"),
      (h * scale).cast("int").as("new_height"))
  }

  /** Synthesize a deterministic media table from any (id, text) corpus —
    * test fixture generator for environments without real media files. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        (pmod(col("doc_id"), lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(1080)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(30)) * 1000 + 1000).as("duration_ms"),
        lit("application/octet-stream").as("mime")).as("meta"))
  }
}
