package graft.tools
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    docs.count() // warmup
    time("q34 jaccard 0.3")(println(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3).count()))
    time("q35 jaccard 0.9 dedup")(println(
      Dedup.nearDedupKeep(docs, "doc_id", "text", 3, 0.9).count()))
    spark.stop()
  }
}
