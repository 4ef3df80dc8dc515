package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/**
 * BPE encode scale measurement: fit once (bounded sample — fit cost is
 * corpus-independent by construction), then time the full-corpus
 * encode `Σ size(tokenIds(text))` per round. The kernel is a per-row
 * codegen pass with a per-task merges-map hoist and piece cache, so
 * the time must scale linearly in corpus bytes — this tool produces
 * the measured cells (BASELINE r17).
 *
 * The vocab axis (r18): pass a production-depth nMerges (16–50 k) and
 * a sample large enough to keep merges partial — the tool reports
 * whether the fit exhausted (merges < nMerges means the sample's
 * vocabulary ran dry), the per-task merges-literal hoist cost (a
 * tiny-input encode whose run time is almost pure fixed overhead),
 * and the corpus encode under the deep model.
 *
 * A `variants > 1` run widens the WORD-SHAPE vocabulary (the fixture
 * corpus tops out ~5 k distinct words at sf16, exhausting the fit near
 * 13.6 k merges): each doc's text is concatenated with deterministic
 * length-preserving word-shape transforms (reverse / upper /
 * upper∘reverse / initcap — disjoint by construction from the
 * replicas' lowercase caesar/affine alphabets, the GenScale
 * perturbation discipline), multiplying distinct pieces by `variants`
 * so a 32 k-merge fit stays PARTIAL. Fit and encode both run over the
 * variant text — the cell measures kernel behavior at production
 * vocabulary depth, not the fixture's token statistics.
 *
 * Usage: BpeScale <sfDir> [rounds] [nMerges] [sampleSize] [variants]
 */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val nMerges = if (args.length > 2) args(2).toInt else 200
    val sampleSize = if (args.length > 3) args(3).toInt else 2048
    val variants = if (args.length > 4) args(4).toInt else 1
    val spark = Sessions.local(32, "bpe-scale")
    val docsRaw = Tables.load(spark, dir, "documents")
    val variantCols = Seq(
      col("text"),
      reverse(col("text")),
      upper(col("text")),
      upper(reverse(col("text"))),
      initcap(col("text")))
    require(variants >= 1 && variants <= variantCols.length,
      s"variants must be in [1, ${variantCols.length}]")
    val docs =
      if (variants == 1) docsRaw
      else docsRaw.withColumn("text",
        concat_ws(" ", variantCols.take(variants): _*))
    val tf0 = System.nanoTime()
    val model = graft.operators.Bpe.fit(docs, "doc_id", "text", nMerges,
      sampleSize)
    val tf1 = System.nanoTime()
    println(f"[bpescale] $dir fit=${(tf1 - tf0) / 1e9}%.2f s " +
      s"merges=${model.merges.length}" +
      (if (model.merges.length < nMerges) " (EXHAUSTED)" else " (partial)"))
    // per-task hoist cell: encode 32 one-word rows across 32 tasks —
    // the work is ~zero, so wall time ≈ literal ship + per-task
    // rank-map build for THIS vocab size (×32 tasks, but parallel)
    for (r <- 1 to rounds) {
      import spark.implicits._
      val t0 = System.nanoTime()
      val tiny = (1 to 32).map(i => s"hoist$i").toDF("text")
        .repartition(32)
        .select(sum(size(graft.operators.Bpe.tokenIds(col("text"), model))))
        .head()
      val t1 = System.nanoTime()
      println(f"[bpescale] $dir hoist r$r tokens=${tiny.getLong(0)} " +
        f"time=${(t1 - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val row = docs.select(
        sum(size(graft.operators.Bpe.tokenIds(col("text"), model))
          .cast("long")),
        sum(graft.operators.TextAnalysis.tokenEstimate(col("text"))
          .cast("long")),
        count(lit(1))).head()
      val t1 = System.nanoTime()
      println(f"[bpescale] $dir r$r docs=${row.getLong(2)} " +
        f"exact_tokens=${row.getLong(0)} pieces=${row.getLong(1)} " +
        f"time=${(t1 - t0) / 1e9}%.2f s")
    }
    // the packed-sequence delivery pass (q136's operator): encode +
    // prefix sum + fragment slices + one seq_id exchange — the cell
    // that must stay token-linear
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val withIds = docs.select(col("doc_id"),
        graft.operators.Bpe.tokenIds(col("text"), model).as("ids"))
      val n = graft.operators.CorpusStats
        .packTokenSequences(withIds, "doc_id", "ids", seqLen = 2048)
        .queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      println(f"[bpescale] $dir pack r$r seqs=$n " +
        f"time=${(t1 - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      graft.ops.materialize.releaseAll()
    }
    spark.stop()
  }
}
