package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/**
 * Fixed-probe BM25 scale measurement: the q127 registry query grows its
 * probe set with the corpus (doc_id % 101 selects ~1% of every scale
 * fixture), so its scale legs convolve corpus growth with probe-set
 * growth. The realistic decontamination shape is a FIXED eval set
 * against a growing corpus — this tool pins the probes to replica 0
 * (doc_id < 10⁸, the same ~50 probe documents at every SF) and times
 * [[graft.operators.CorpusStats.bm25TopK]] against each fixture, so
 * the reported leg is the pure corpus term.
 *
 * Usage: Bm25Scale <sfDir> [rounds]  — prints one line per round.
 */
object Bm25Scale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(32, "bm25-scale")
    for (r <- 1 to rounds) {
      val docs = Tables.load(spark, dir, "documents")
      val t0 = System.nanoTime()
      val n = graft.operators.CorpusStats.bm25TopK(
        docs.filter(col("doc_id") % 101 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 100000000L),
        "doc_id", "text", k = 5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bm25scale] $dir r$r rows=$n time=$sec%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
