package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/**
 * Fixed-probe hybrid-retrieval scale measurement — [[Bm25Scale]]'s
 * discipline applied to [[graft.operators.Retrieval.hybridBm25CosineTopK]]
 * (q130's operator). Probes pin to replica 0 (doc_id < 10⁸, the same
 * ~50 documents at every SF), so the reported leg is the pure corpus
 * term: the BM25 leg's broadcast-gated postings, the dense leg's
 * streaming brute-force scan, and the fusion's candidate-list-only
 * shuffles all grow with the corpus while the probe side stays fixed.
 *
 * Usage: HybridScale <sfDir> [rounds]  — prints one line per round.
 */
object HybridScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(32, "hybrid-scale")
    for (r <- 1 to rounds) {
      val docs = Tables.load(spark, dir, "documents")
      val embs = Tables.load(spark, dir, "embeddings")
      val probe = col("doc_id") % 101 === 0 && col("doc_id") < 100000000L
      val probeV = col("vec_id") % 101 === 0 && col("vec_id") < 100000000L
      val t0 = System.nanoTime()
      val n = graft.operators.Retrieval.hybridBm25CosineTopK(
        docs.filter(col("doc_id") % 101 =!= 0), "doc_id", "text",
        embs.filter(col("vec_id") % 101 =!= 0), "vec_id", "embedding",
        docs.filter(probe), embs.filter(probeV),
        kPerLeg = 10, k = 5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[hybridscale] $dir r$r rows=$n time=$sec%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
