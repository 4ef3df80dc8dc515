package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/**
 * Fixed-probe hybrid-retrieval scale measurement — [[Bm25Scale]]'s
 * discipline applied to the retrieval family. Probes pin to replica 0
 * (doc_id < 10⁸, the same ~50 documents at every SF), so the reported
 * leg is the pure corpus term: the BM25 leg's broadcast-gated
 * postings, the dense leg's scan (brute force for the exact hybrid,
 * bucket-pruned ADC for the ANN hybrid), and the fusion's
 * candidate-list-only shuffles all grow with the corpus while the
 * probe side stays fixed.
 *
 * Usage: HybridScale <sfDir> [rounds] [mode]
 *   mode = exact (default) — q130's exact hybrid + q131's MMR re-rank
 *   mode = ann             — build the persisted IVF+PQ index once
 *                            (timed separately), then per-round time
 *                            q133's ANN hybrid: the dense-leg cell that
 *                            must stay sublinear in the corpus
 *   mode = mmrprobes       — MMR re-rank at GROWING probe counts on one
 *                            SF (%101 → %11 → %3 splits): per-probe
 *                            cost must fall as the ~0.9 s/step fixed
 *                            job overhead amortizes (VERDICT r16 #6)
 */
object HybridScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val mode = if (args.length > 2) args(2) else "exact"
    val spark = Sessions.local(32, "hybrid-scale")
    mode match {
      case "exact"     => exact(spark, dir, rounds)
      case "ann"       => ann(spark, dir, rounds)
      case "mmrprobes" => mmrProbes(spark, dir, rounds)
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }

  private def exact(spark: org.apache.spark.sql.SparkSession,
                    dir: String, rounds: Int): Unit = {
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
  }

  private def ann(spark: org.apache.spark.sql.SparkSession,
                  dir: String, rounds: Int): Unit = {
    val docs = Tables.load(spark, dir, "documents")
    val embs = Tables.load(spark, dir, "embeddings")
    val corpusEmbs = embs.filter(col("vec_id") % 101 =!= 0)
    val tb0 = System.nanoTime()
    graft.operators.AnnIndex.writeAnnIndex(corpusEmbs, "vec_id",
      "embedding", base = "graft_ann_scale", dim = 64, nCentroids = 16,
      m = 16, pqK = 16, buckets = 8)
    val tb1 = System.nanoTime()
    println(f"[hybridscale-ann] $dir index_build=${(tb1 - tb0) / 1e9}%.2f s")
    for (r <- 1 to rounds) {
      val probe = col("doc_id") % 101 === 0 && col("doc_id") < 100000000L
      val probeV = col("vec_id") % 101 === 0 && col("vec_id") < 100000000L
      val t0 = System.nanoTime()
      val n = graft.operators.Retrieval.hybridBm25AnnTopK(spark,
        docs.filter(col("doc_id") % 101 =!= 0), "doc_id", "text",
        docs.filter(probe), embs.filter(probeV), "vec_id", "embedding",
        base = "graft_ann_scale", kPerLeg = 10, k = 10).count()
      val t1 = System.nanoTime()
      println(f"[hybridscale-ann] $dir r$r rows=$n " +
        f"time=${(t1 - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
  }

  private def mmrProbes(spark: org.apache.spark.sql.SparkSession,
                        dir: String, rounds: Int): Unit = {
    val docs = Tables.load(spark, dir, "documents")
    val embs = Tables.load(spark, dir, "embeddings")
    // growing probe sets on ONE corpus: the candidate build (hybrid)
    // is timed apart from the re-rank, whose per-step fixed job
    // overhead is the amortization claim under test
    for (m <- Seq(101, 11, 3); r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val fused = graft.operators.Retrieval.hybridBm25CosineTopK(
        docs.filter(col("doc_id") % 101 =!= 0), "doc_id", "text",
        embs.filter(col("vec_id") % 101 =!= 0), "vec_id", "embedding",
        // probes may overlap the corpus (for m ≠ 101 most do) — the
        // r17 self-match contract keeps both legs well-defined there
        docs.filter(col("doc_id") % m === 0),
        embs.filter(col("vec_id") % m === 0),
        kPerLeg = 10, k = 10)
      val nProbes = fused.select(col("q_id")).distinct().count()
      val t1 = System.nanoTime()
      val n = graft.operators.Retrieval.mmrRerank(
        fused.select(col("q_id"), col("doc_id"), col("rrf_u").as("rel_u")),
        embs, "vec_id", "embedding", k = 5).count()
      val t2 = System.nanoTime()
      val secH = (t1 - t0) / 1e9
      val secM = (t2 - t1) / 1e9
      val perProbe = secM / math.max(nProbes, 1) * 1000
      println(f"[hybridscale-mmr] $dir mod=$m r$r probes=$nProbes " +
        f"hybrid=$secH%.2f s mmr=$secM%.2f s mmr_rows=$n " +
        f"per_probe=$perProbe%.3f ms")
      spark.catalog.clearCache()
    }
  }
}
