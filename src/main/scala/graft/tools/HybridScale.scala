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
      val fused = graft.operators.Retrieval.hybridBm25CosineTopK(
        docs.filter(col("doc_id") % 101 =!= 0), "doc_id", "text",
        embs.filter(col("vec_id") % 101 =!= 0), "vec_id", "embedding",
        docs.filter(probe), embs.filter(probeV),
        kPerLeg = 10, k = 10)
      val n = fused.count()
      val t1 = System.nanoTime()
      // the re-rank leg is candidate-bound: its cost must stay flat as
      // the corpus grows (only the legs above see corpus rows)
      val m = graft.operators.Retrieval.mmrRerank(
        fused.select(col("q_id"), col("doc_id"), col("rrf_u").as("rel_u")),
        embs, "vec_id", "embedding", k = 5).count()
      val t2 = System.nanoTime()
      val sec = (t1 - t0) / 1e9
      val secM = (t2 - t1) / 1e9
      println(f"[hybridscale] $dir r$r rows=$n time=$sec%.2f s " +
        f"mmr_rows=$m mmr_extra=$secM%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
