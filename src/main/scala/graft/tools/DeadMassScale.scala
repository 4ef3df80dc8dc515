package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.{AnnIndex, LexIndex}

/**
 * Measures what the tombstone-mass compaction policy buys (r19,
 * VERDICT task 3): build each standing index, DELETE ~25% of its ids
 * (dead/live = 1/3, past the 0.3 default bound), time the search with
 * the dead mass riding every query (anti-join + dead rows still
 * scanned), then let `compactIfDead` fire and time it again. Pages are
 * asserted bit-identical across the compaction (deletes were already
 * applied logically — the policy is a COST trigger, not a semantics
 * change). Min-of-N with the relation cache cleared per round, the
 * CompactScale discipline.
 *
 * Usage: DeadMassScale [sfDir] [rounds]
 */
object DeadMassScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "deadmass-scale")
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata_sf4"
    val rounds = if (args.length > 1) args(1).toInt else 5
    def minOf(body: => Unit): Double = (1 to rounds).map { _ =>
      spark.catalog.clearCache()
      val t = System.nanoTime()
      body
      (System.nanoTime() - t) / 1e9
    }.min

    // ---- ANN ----
    val annBase = "graft_ann_deadmass"
    val e = Tables.load(spark, dir, "embeddings")
    AnnIndex.writeAnnIndex(e, "vec_id", "embedding", annBase, dim = 64,
      nCentroids = 16, m = 16, pqK = 16, buckets = 8)
    AnnIndex.tombstoneAnnIds(spark, annBase,
      e.filter(col("vec_id") % 4 === 1).select("vec_id"))
    val annFrac = AnnIndex.tombstoneFraction(spark, annBase)
    def annPage() = AnnIndex.ivfPqTopKBucketed(spark,
        e.filter(col("vec_id") < 20 && col("vec_id") % 4 =!= 1),
        "vec_id", "embedding", k = 10, base = annBase, nProbe = 4)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val annBefore = annPage()
    val annPre = minOf(annPage())
    assert(!AnnIndex.compactIfDead(spark, annBase, 0.5), "below bound")
    val ta0 = System.nanoTime()
    assert(AnnIndex.compactIfDead(spark, annBase, 0.3), "must fire")
    val taC = (System.nanoTime() - ta0) / 1e9
    assert(annPage() == annBefore, "ANN page changed across compaction!")
    val annPost = minOf(annPage())
    println(f"[deadmass] $dir ann frac=$annFrac%.3f search " +
      f"pre=$annPre%.3f s post=$annPost%.3f s (compact $taC%.1f s; " +
      "pages bit-identical)")

    // ---- LEX ----
    val lexBase = "graft_lex_deadmass"
    val docs = Tables.load(spark, dir, "documents")
    LexIndex.writeLexIndex(docs, "doc_id", "text", lexBase, buckets = 16)
    LexIndex.tombstoneLexDocs(spark, lexBase,
      docs.filter(col("doc_id") % 4 === 1).select("doc_id"))
    val lexFrac = LexIndex.tombstoneFraction(spark, lexBase)
    val probes = docs.filter(col("doc_id") % 101 === 0 &&
      col("doc_id") % 4 =!= 1 && col("doc_id") < 100000000L)
    def lexPage() = LexIndex.bm25TopKIndexed(spark, probes, "doc_id",
        "text", lexBase, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val lexBefore = lexPage()
    val lexPre = minOf(lexPage())
    val tl0 = System.nanoTime()
    assert(LexIndex.compactIfDead(spark, lexBase, 0.3), "must fire")
    val tlC = (System.nanoTime() - tl0) / 1e9
    assert(lexPage() == lexBefore, "LEX page changed across compaction!")
    val lexPost = minOf(lexPage())
    println(f"[deadmass] $dir lex frac=$lexFrac%.3f search " +
      f"pre=$lexPre%.3f s post=$lexPost%.3f s (compact $tlC%.1f s; " +
      "pages bit-identical)")
    spark.stop()
  }
}
