package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Leg-level timing of q138's hybrid decontamination and the pack
  * stage's internal phases, under the bench session settings.
  * Usage: runMain graft.tools.HybridCut [sfDir] */
object HybridCut {
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
    val embs = Tables.load(spark, dir, "embeddings")
    val corpusDocs = docs.filter(col("doc_id") % 101 =!= 0)
    val probeDocs = docs.filter(col("doc_id") % 101 === 0)
    val corpusEmbs = embs.filter(col("vec_id") % 101 =!= 0)
    val probeEmbs = embs.filter(col("vec_id") % 101 === 0)
    val kr0 = corpusEmbs.agg(count(lit(1)),
      sum(col("vec_id").cast("long") +
        floor(abs(element_at(col("embedding"), 1).cast("double")) * 4096)
          .cast("long"))).head()
    graft.operators.AnnIndex.ensureAnnIndex(corpusEmbs, "vec_id",
      "embedding", base = "graft_ann_q133", dim = 64,
      key = (kr0.getLong(0), kr0.getLong(1)),
      nCentroids = 16, m = 16, pqK = 16, buckets = 8)
    val model = graft.operators.Bpe.fit(docs, "doc_id", "text", nMerges = 200)

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[leg] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    for (round <- 1 to 2) {
      println(s"[leg] ---- round $round ----")
      time("lex:bm25TopK") {
        graft.operators.CorpusStats.bm25TopK(corpusDocs, "doc_id", "text",
          probeDocs, "doc_id", "text", 10)
      }
      time("den:ivfPqBucketed") {
        graft.operators.AnnIndex.ivfPqTopKBucketed(spark, probeEmbs,
          "vec_id", "embedding", 10, "graft_ann_q133", 4)
      }
      time("hybrid:full") {
        graft.operators.Retrieval.hybridBm25AnnTopK(spark,
          corpusDocs, "doc_id", "text", probeDocs, probeEmbs,
          "vec_id", "embedding", base = "graft_ann_q133",
          kPerLeg = 10, k = 5).select(col("doc_id")).distinct()
      }
      // pack phases: input = encode over the full corpus (no upstream
      // chain, so phase deltas are clean)
      val enc = docs.select(col("doc_id"),
        graft.operators.Bpe.tokenIds(col("text"), model).as("ids"))
      time("pack:encode-only") { enc }
      time("pack:prefixSum") {
        val sized = enc.select(col("doc_id").as("__doc"), col("ids").as("__ids"))
          .withColumn("__n", size(col("__ids")).cast("long"))
          .filter(col("__n") > 0)
        graft.ops.relational.contiguousPrefixSum(sized,
          Seq(col("__doc")), col("__n"), "__cum")
      }
      time("pack:full") {
        graft.operators.CorpusStats.packTokenSequences(enc,
          "doc_id", "ids", seqLen = 256)
      }
    }
    spark.stop()
  }
}
