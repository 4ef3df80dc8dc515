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
 * Usage: BpeScale <sfDir> [rounds] [nMerges]
 */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val nMerges = if (args.length > 2) args(2).toInt else 200
    val spark = Sessions.local(32, "bpe-scale")
    val docs = Tables.load(spark, dir, "documents")
    val tf0 = System.nanoTime()
    val model = graft.operators.Bpe.fit(docs, "doc_id", "text", nMerges)
    val tf1 = System.nanoTime()
    println(f"[bpescale] $dir fit=${(tf1 - tf0) / 1e9}%.2f s " +
      s"merges=${model.merges.length}")
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
