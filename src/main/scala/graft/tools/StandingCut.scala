package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Component profiler for the standing-index queries' STEADY-STATE
  * cost (q133/q139/q140/q142/q144): after a warmup call builds the
  * indexes, what does each later call pay, and how much of it is the
  * per-call corpus-key aggregation vs the probe itself? Bench session
  * settings (CurationCut's harness). Usage:
  * runMain graft.tools.StandingCut [sfDir] */
object StandingCut {
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

    def embKey(): (Long, Long) = {
      val r = corpusEmbs.agg(count(lit(1)),
        sum(col("vec_id").cast("long") +
          floor(abs(element_at(col("embedding"), 1).cast("double")) * 4096)
            .cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def docKey(): (Long, Long) = {
      val r = corpusDocs.agg(count(lit(1)),
        sum(col("doc_id").cast("long") + length(col("text")).cast("long")))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    // warmup: build both standing indexes once (q139/q140's bases)
    val ek = embKey(); val dk = docKey()
    graft.operators.AnnIndex.ensureAnnIndex(corpusEmbs, "vec_id",
      "embedding", base = "graft_ann_q133", dim = 64, key = ek,
      nCentroids = 16, m = 16, pqK = 16, buckets = 8)
    graft.operators.LexIndex.ensureLexIndex(corpusDocs, "doc_id", "text",
      base = "graft_lex_q139", key = dk, buckets = 8)
    graft.operators.LexIndex.ensureLexIndex(corpusDocs, "doc_id", "text",
      base = "graft_lex_q142", key = dk, buckets = 8)
    graft.operators.LexIndex.tombstoneLexDocs(spark, "graft_lex_q142",
      corpusDocs.filter(col("doc_id") % 7 === 1).select("doc_id"))

    def t(label: String)(body: => Unit): Unit = {
      for (round <- 1 to 3) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[cut] $label%-28s r$round $dt%7.3f s")
      }
    }

    t("emb_corpus_key")(embKey())
    t("doc_corpus_key")(docKey())
    t("ensure_ann_fresh") {
      graft.operators.AnnIndex.ensureAnnIndex(corpusEmbs, "vec_id",
        "embedding", base = "graft_ann_q133", dim = 64, key = ek,
        nCentroids = 16, m = 16, pqK = 16, buckets = 8)
    }
    t("ensure_lex_fresh") {
      graft.operators.LexIndex.ensureLexIndex(corpusDocs, "doc_id", "text",
        base = "graft_lex_q139", key = dk, buckets = 8)
    }
    t("q139_probe_only") {
      graft.operators.LexIndex.bm25TopKIndexed(spark, probeDocs, "doc_id",
        "text", base = "graft_lex_q139", k = 10)
        .queryExecution.toRdd.count()
    }
    t("q140_probe_only") {
      graft.operators.Retrieval.hybridStandingTopK(spark,
        probeDocs, "doc_id", "text", probeEmbs, "vec_id", "embedding",
        lexBase = "graft_lex_q139", annBase = "graft_ann_q133",
        kPerLeg = 10, k = 5).queryExecution.toRdd.count()
    }
    t("q142_retombstone") {
      graft.operators.LexIndex.tombstoneLexDocs(spark, "graft_lex_q142",
        corpusDocs.filter(col("doc_id") % 7 === 1).select("doc_id"))
    }
    t("q142_probe_only") {
      graft.operators.LexIndex.bm25TopKIndexed(spark, probeDocs, "doc_id",
        "text", base = "graft_lex_q142", k = 10)
        .queryExecution.toRdd.count()
    }
    t("q139_steady_full") {
      val k2 = docKey()
      graft.operators.LexIndex.ensureLexIndex(corpusDocs, "doc_id", "text",
        base = "graft_lex_q139", key = k2, buckets = 8)
      graft.operators.LexIndex.bm25TopKIndexed(spark, probeDocs, "doc_id",
        "text", base = "graft_lex_q139", k = 10)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
