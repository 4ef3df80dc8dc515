package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Cumulative-prefix profiler for the q138 curation chain under the
  * BENCH session settings (Q138Scale's per-stage pins distort the
  * numbers — they hold every intermediate at once and evict each
  * other; this tool instead times the chain cut at stage k, from a
  * clean cache, exactly as the bench executes it, so stage cost =
  * cut(k) − cut(k−1)). Usage: runMain graft.tools.CurationCut [sfDir] */
object CurationCut {
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
    import spark.implicits._

    val docs = Tables.load(spark, dir, "documents")
    val embs = Tables.load(spark, dir, "embeddings")
    val corpusDocs = docs.filter(col("doc_id") % 101 =!= 0)
    val probeDocs = docs.filter(col("doc_id") % 101 === 0)
    val corpusEmbs = embs.filter(col("vec_id") % 101 =!= 0)
    val kr0 = corpusEmbs.agg(count(lit(1)),
      sum(col("vec_id").cast("long") +
        floor(abs(element_at(col("embedding"), 1).cast("double")) * 4096)
          .cast("long"))).head()
    val key = (kr0.getLong(0), kr0.getLong(1))
    graft.operators.AnnIndex.ensureAnnIndex(corpusEmbs, "vec_id",
      "embedding", base = "graft_ann_q133", dim = 64, key = key,
      nCentroids = 16, m = 16, pqK = 16, buckets = 8)
    // BPE model fit once (the bench memoizes it across samples too)
    val krd = docs.agg(count(lit(1)),
      sum(col("doc_id").cast("long") + length(col("text")).cast("long")))
      .head()
    val model = graft.operators.Bpe.fit(docs, "doc_id", "text", nMerges = 200)
    val _ = (krd.getLong(0), krd.getLong(1))

    /** Build the q138 chain, cut at stage k (1..8). */
    def chain(cut: Int): DataFrame = {
      val contaminated = graft.operators.Retrieval.hybridBm25AnnTopK(spark,
          corpusDocs, "doc_id", "text", probeDocs,
          embs.filter(col("vec_id") % 101 === 0), "vec_id", "embedding",
          base = "graft_ann_q133", kPerLeg = 10, k = 5)
        .select(col("doc_id")).distinct()
      if (cut == 1) return contaminated
      val clean = corpusDocs.join(contaminated, Seq("doc_id"), "left_anti")
      val toks = graft.operators.TextAnalysis.tokens(col("text"))
      val gated = graft.ops.materialize(clean.filter(
        size(toks) >= 20 &&
          size(array_distinct(toks)) / size(toks) >= lit(0.33)))
      if (cut == 2) return gated
      val keepIds = graft.operators.Dedup.dupSpanCoverage(gated,
          "doc_id", "text", window = 8, minDocs = 2,
          baseHash = Some(graft.operators.Dedup.md5Hash60))
        .filter(col("total_tokens") > 0 && col("dup_coverage") < 0.8)
        .select("doc_id")
      if (cut == 3) return keepIds
      val kept = graft.ops.materialize(
        gated.join(keepIds, Seq("doc_id"), "left_semi"))
      if (cut == 4) return kept
      val selected = graft.operators.CorpusStats.temperatureMixture(
        kept, "doc_id", "lang", alpha = 0.5, budgetFraction = 0.5,
        salt = "curate3")
      if (cut == 5) return selected
      val withIds = selected.select(col("doc_id"),
        graft.operators.Bpe.tokenIds(col("text"), model).as("ids"))
      if (cut == 6) return withIds
      val seqs = graft.operators.CorpusStats
        .packTokenSequences(withIds, "doc_id", "ids", seqLen = 256)
      if (cut == 7) return seqs
      seqs.select(col("seq_id"), col("n_tokens"),
          aggregate(col("ids"), lit(0L),
            (acc, x) => acc + x.cast("long")).as("id_sum"),
          aggregate(zip_with(col("ids"),
              sequence(lit(1L), size(col("ids")).cast("long")),
              (x, i) => x.cast("long") * i),
            lit(0L), (acc, x) => acc + x).as("possum"))
        .groupBy(expr("seq_id DIV 64").as("shard_id"))
        .agg(count(lit(1)).as("n_seqs"), sum("n_tokens").as("n_tokens"),
          sum("id_sum").as("id_sum"), sum("possum").as("possum"))
    }

    val names = Map(1 -> "contaminated", 2 -> "gated", 3 -> "keepIds",
      4 -> "kept", 5 -> "selected", 6 -> "withIds", 7 -> "seqs",
      8 -> "manifest")
    for (round <- 1 to 2; cut <- 1 to 8) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      chain(cut).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cut] r$round cut=$cut%-2d ${names(cut)}%-14s $dt%7.2f s")
    }
    spark.stop()
  }
}
