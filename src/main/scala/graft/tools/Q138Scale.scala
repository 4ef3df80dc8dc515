package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Stage-level timing of the q138 curation-v3 capstone at one SF:
  * where do the ~11.5 s go, and which stages are reducible? Each stage
  * is forced with a count/materialize in sequence, so a stage's time
  * includes exactly the work the previous stages did not pin. */
object Q138Scale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "q138scale")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def tick[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[q138scale] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    val embs = Tables.load(spark, dir, "embeddings")
    val corpusDocs = docs.filter(col("doc_id") % 101 =!= 0)
    val probeDocs = docs.filter(col("doc_id") % 101 === 0)
    val corpusEmbs = embs.filter(col("vec_id") % 101 =!= 0)
    for (round <- 1 to 2) {
      println(s"[q138scale] ---- round $round ----")
      val (n, fp) = tick("corpusKey") {
        val r = corpusEmbs.agg(count(lit(1)),
          sum(col("vec_id").cast("long") +
            floor(abs(element_at(col("embedding"), 1).cast("double")) * 4096)
              .cast("long"))).head()
        (r.getLong(0), r.getLong(1))
      }
      tick("ensureAnn") {
        graft.operators.AnnIndex.ensureAnnIndex(corpusEmbs, "vec_id",
          "embedding", base = "graft_ann_q138s", dim = 64, key = (n, fp),
          nCentroids = 16, m = 16, pqK = 16, buckets = 8)
      }
      val contaminated = tick("hybrid") {
        graft.ops.materialize(
          graft.operators.Retrieval.hybridBm25AnnTopK(spark,
            corpusDocs, "doc_id", "text", probeDocs,
            embs.filter(col("vec_id") % 101 === 0), "vec_id", "embedding",
            base = "graft_ann_q138s", kPerLeg = 10, k = 5)
          .select(col("doc_id")).distinct())
      }
      val clean = corpusDocs.join(contaminated, Seq("doc_id"), "left_anti")
      val toks = graft.operators.TextAnalysis.tokens(col("text"))
      val gated = tick("gates+pin") {
        graft.ops.materialize(clean.filter(
          size(toks) >= 20 &&
            size(array_distinct(toks)) / size(toks) >= lit(0.33)))
      }
      val keepIds = tick("spanCoverage") {
        graft.ops.materialize(
          graft.operators.Dedup.dupSpanCoverage(gated,
            "doc_id", "text", window = 8, minDocs = 2,
            baseHash = Some(graft.operators.Dedup.md5Hash60))
          .filter(col("total_tokens") > 0 && col("dup_coverage") < 0.8)
          .select("doc_id"))
      }
      val kept = tick("kept+pin") {
        graft.ops.materialize(
          gated.join(keepIds, Seq("doc_id"), "left_semi"))
      }
      val selected = tick("mixture") {
        graft.ops.materialize(
          graft.operators.CorpusStats.temperatureMixture(
            kept, "doc_id", "lang", alpha = 0.5, budgetFraction = 0.5,
            salt = "curate3"))
      }
      val model = tick("bpeFit") {
        val kr = docs.agg(count(lit(1)),
          sum(col("doc_id").cast("long") + length(col("text")).cast("long")))
          .head()
        val _ = kr
        graft.operators.Bpe.fit(docs, "doc_id", "text", nMerges = 200)
      }
      val withIds = tick("encode+pin") {
        graft.ops.materialize(selected.select(col("doc_id"),
          graft.operators.Bpe.tokenIds(col("text"), model).as("ids")))
      }
      val seqs = tick("pack+pin") {
        graft.ops.materialize(graft.operators.CorpusStats
          .packTokenSequences(withIds, "doc_id", "ids", seqLen = 256))
      }
      tick("manifest") {
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
          .queryExecution.toRdd.count()
      }
      Seq(contaminated, gated, keepIds, kept, selected, withIds, seqs)
        .foreach(graft.ops.materialize.release)
      spark.catalog.clearCache()
    }
  }
}
