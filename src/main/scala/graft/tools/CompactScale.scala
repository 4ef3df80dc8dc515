package graft.tools

import org.apache.spark.sql.functions.col

import graft.core.{Sessions, Tables}
import graft.operators.AnnIndex

/**
 * Measures what [[graft.operators.AnnIndex.compactAnnIndex]] buys at
 * the months-of-nightly-appends shape: build the index over one slice
 * of the corpus, append the remaining slices batch-by-batch (each
 * append writes per-bucket files — the real ingest fragmentation),
 * then time the bucket-pruned search against the fragmented table,
 * compact, and time it again. Also asserts the search pages are
 * bit-identical across the compact (the spec's contract, re-checked
 * at scale). Search timings are min-of-N with the relation cache
 * cleared per round, the SearchBench discipline.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.CompactScale [batches]
 */
object CompactScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "compactscale")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_sf4")
    val batches = if (args.length > 0) args(0).toInt else 48
    val buckets = 8
    val base = "graft_ann_compact"
    val e = Tables.load(spark, dir, "embeddings")
    val slices = batches + 1
    val t0 = System.nanoTime()
    AnnIndex.writeAnnIndex(e.filter(col("vec_id") % slices === 0),
      "vec_id", "embedding", base, dim = 64, nCentroids = 16, m = 16,
      pqK = 16, buckets = buckets)
    for (b <- 1 to batches)
      AnnIndex.appendToAnnIndex(spark,
        e.filter(col("vec_id") % slices === b), "vec_id", "embedding",
        base, buckets = buckets)
    println(f"[compactscale] $dir build+${batches} appends " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    def files: Int = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(s"${base}_codes"))
          .location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(s => s.isFile &&
        !s.getPath.getName.startsWith("_"))
    }
    def page() = AnnIndex.ivfPqTopKBucketed(spark,
        e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 10, base = base, nProbe = 4)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    def searchMin(rounds: Int): Double = (1 to rounds).map { _ =>
      spark.catalog.clearCache()
      val t = System.nanoTime()
      page()
      (System.nanoTime() - t) / 1e9
    }.min
    val fPre = files
    val pagePre = page()
    val sPre = searchMin(5)
    println(f"[compactscale] fragmented files=$fPre search=$sPre%.3f s")
    val tc0 = System.nanoTime()
    AnnIndex.compactAnnIndex(spark, base, buckets)
    val tc = (System.nanoTime() - tc0) / 1e9
    val fPost = files
    val pagePost = page()
    assert(pagePost == pagePre, "search page changed across compact!")
    val sPost = searchMin(5)
    println(f"[compactscale] compacted  files=$fPost search=$sPost%.3f s " +
      f"(compact itself $tc%.2f s; pages bit-identical)")
    spark.stop()
  }
}
