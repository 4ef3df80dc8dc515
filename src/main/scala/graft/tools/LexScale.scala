package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.LexIndex

/**
 * Standing-vs-per-call lexical leg at scale (the [[Bm25Scale]] shape:
 * FIXED ~50-probe eval set, growing corpus): times the once-per-corpus
 * [[LexIndex.writeLexIndex]] build, then min-of-N for the per-call
 * [[graft.operators.CorpusStats.bm25TopK]] (re-explodes the corpus
 * every batch) against [[LexIndex.bm25TopKIndexed]] (bucket-pruned
 * postings scan) — the number that justifies the index is the
 * steady-state ratio, the number that bounds it is the build cost.
 *
 * Usage: LexScale <sfDir> [rounds] [buckets]
 */
object LexScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val buckets = if (args.length > 2) args(2).toInt else 16
    val spark = Sessions.local(32, "lex-scale")
    val Base = "graft_lex_scale"
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 101 =!= 0)
    val probes = docs.filter(col("doc_id") % 101 === 0 &&
      col("doc_id") < 100000000L)
    val tb0 = System.nanoTime()
    LexIndex.writeLexIndex(corpus, "doc_id", "text", Base, buckets)
    println(f"[lexscale] $dir build=${(System.nanoTime() - tb0) / 1e9}%.2f s " +
      f"(buckets=$buckets)")
    // narrow probes: the same eval docs truncated to their first 4
    // tokens — a handful of distinct terms, so the isin predicate
    // actually prunes buckets/row-groups (the wide-vocabulary probes
    // above touch every bucket and measure only the saved explode)
    val narrow = probes.select(col("doc_id"),
      array_join(slice(split(col("text"), " "), 1, 4), " ").as("text"))
    def cell(tag: String, r: Int, p: org.apache.spark.sql.DataFrame)
        : Unit = {
      val t0 = System.nanoTime()
      val n0 = graft.operators.CorpusStats.bm25TopK(corpus, "doc_id",
        "text", p, "doc_id", "text", k = 5).count()
      val perCall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val n1 = LexIndex.bm25TopKIndexed(spark, p, "doc_id", "text",
        Base, k = 5).count()
      val indexed = (System.nanoTime() - t1) / 1e9
      require(n0 == n1, s"row drift: per-call $n0 vs indexed $n1")
      println(f"[lexscale] $dir $tag r$r rows=$n0 percall=$perCall%.2f s " +
        f"indexed=$indexed%.2f s")
      spark.catalog.clearCache()
    }
    for (r <- 1 to rounds) cell("wide", r, probes)
    for (r <- 1 to rounds) cell("narrow", r, narrow)
    spark.stop()
  }
}
