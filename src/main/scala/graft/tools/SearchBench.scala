package graft.tools

import org.apache.spark.sql.functions.col

/**
 * Measures the q122 persisted-index SEARCH path alone, separated from
 * the one-time build (fits + full-corpus encode + table writes + oracle
 * dumps) that dominates the registered query's bench time. The build
 * runs once up front; each timed round is exactly the nightly-search
 * shape: bucket-pruned codes scan + broadcast probes + top-k aggregate.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.SearchBench
 * Prints one line per round; report the min like Bench does.
 */
object SearchBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "searchbench")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    val t0 = System.nanoTime()
    graft.operators.AnnIndex.writeAnnIndex(e, "vec_id", "embedding",
      base = "graft_ann_q122", dim = 64, nCentroids = 16, m = 16,
      pqK = 16, buckets = 8)
    println(f"[searchbench] build=${(System.nanoTime() - t0) / 1e9}%.3f s")
    for (r <- 1 to 6) {
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val n = graft.operators.AnnIndex.ivfPqTopKBucketed(spark,
        e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 10, base = "graft_ann_q122", nProbe = 4).count()
      println(f"[searchbench] r$r rows=$n search=${(System.nanoTime() - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
