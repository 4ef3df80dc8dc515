package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Ad-hoc profiling scratchpad (edited per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 101 =!= 0)
    val probes = docs.filter(col("doc_id") % 101 === 0)
    // vocab size
    val vocab = probes.select(explode(
        graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .distinct().collect()
    println(s"[scratch] probe vocab size = ${vocab.length}")

    for (r <- 1 to 4) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val q = graft.operators.CorpusStats.bm25TopK(corpus, "doc_id",
        "text", probes, "doc_id", "text", k = 5)
      q.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] q127 fused      r$r $dt%6.2f s")
      if (r == 1) {
        val plan = q.queryExecution.executedPlan.toString
        val hit = plan.linesIterator.filter(l =>
          l.contains("INSET") || l.contains(" IN (")).take(3).toList
        println("[scratch] inset-lines: " +
          (if (hit.isEmpty) "NONE" else hit.map(_.take(160)).mkString(" | ")))
      }
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.operators.CorpusStats.bm25TopK(corpus, "doc_id",
        "text", probes, "doc_id", "text", k = 5, collectVocab = false)
        .queryExecution.toRdd.count()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"[scratch] q127 semi-join  r$r $dt1%6.2f s")
    }
    spark.stop()
  }
}
