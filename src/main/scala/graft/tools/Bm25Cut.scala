package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.TextAnalysis

/** Phase-level timing of bm25TopK's internals (the q127/q130/q133/q138
  * lexical leg) under bench session settings.
  * Usage: runMain graft.tools.Bm25Cut [sfDir] */
object Bm25Cut {
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
    val corpusDocs = docs.filter(col("doc_id") % 101 =!= 0)
    val probeDocs = docs.filter(col("doc_id") % 101 === 0)

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[bm] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val toks = corpusDocs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("__toks"))

    for (round <- 1 to 3) {
      println(s"[bm] ---- round $round ----")
      time("tokenize-only") {
        toks.select(col("doc_id"), size(col("__toks")).as("n"))
      }
      time("explode-raw") {
        toks.select(col("doc_id"), explode(col("__toks")).as("term"))
          .groupBy(lit(1)).agg(count(lit(1)))
      }
      time("posts-agg") {
        toks.select(col("doc_id"), size(col("__toks")).cast("long").as("len"),
            explode(col("__toks")).as("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
      }
      time("tot-agg") {
        toks.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(greatest(size(col("__toks")), lit(0)).cast("long")),
            lit(0L)).as("n_toks"))
      }
      time("bm25-full") {
        graft.operators.CorpusStats.bm25TopK(corpusDocs, "doc_id", "text",
          probeDocs, "doc_id", "text", 10)
      }
    }
    spark.stop()
  }
}
