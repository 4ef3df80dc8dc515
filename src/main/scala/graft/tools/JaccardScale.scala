package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Sessions

/**
 * q34 (exact n-gram Jaccard, PPJoin) scale measurement — answers the
 * r15 verdict's open question: does the prefix + length + positional
 * candidate filtering keep the candidate-pair count linear-in-corpus
 * at 800 k docs (sf16), or does verification degrade toward the
 * Σ df(s)² self-join it exists to avoid?
 *
 * Prints, per fixture: doc count, candidate pairs surviving the
 * PPJoin filters, verified pairs at the threshold, and the
 * candidates-per-doc ratio — linear scaling means the ratio stays
 * flat across fixtures. Uses the same (n=3, t=0.3) parameters as the
 * registered q34 query.
 *
 * Usage: JaccardScale <sfDir> [n] [threshold]
 */
object JaccardScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val t = if (args.length > 2) args(2).toDouble else 0.3
    val spark = Sessions.local(32, "jaccard-scale")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val (sets, cand) = graft.operators.Dedup.jaccardCandidatePairs(
      docs, "doc_id", "text", n, t)
    val nCand = cand.count()
    val tCand = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nPairs = graft.operators.Dedup.jaccardPairs(
      docs, "doc_id", "text", n, t).count()
    val tAll = (System.nanoTime() - t1) / 1e9
    println(f"[jaccardscale] $dir docs=$nDocs cand=$nCand " +
      f"cand/doc=${nCand.toDouble / nDocs}%.2f verified=$nPairs " +
      f"candStage=$tCand%.1f s full=$tAll%.1f s")
    val _ = sets // the candidate stage's pin; released with the session
    spark.stop()
  }
}
