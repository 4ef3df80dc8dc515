package graft.tools

import graft.core.Sessions

/** Diagnostic: print the input-split (scan task) count per table for a
  * fixture dir — the carry-forward-3 artifact is CPU-heavy sf16 scans
  * coalescing into a couple of input tasks. Usage:
  *   runMain graft.tools.ScanDiag <sfDir> [table ...]
  */
object ScanDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tables =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("documents", "embeddings", "lineitem", "orders", "events")
    val spark = Sessions.local()
    tables.foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val parts = df.queryExecution.toRdd.getNumPartitions
      val n = df.inputFiles.length
      println(f"$t%-12s files=$n%4d scanPartitions=$parts%4d")
    }
    spark.stop()
  }
}
