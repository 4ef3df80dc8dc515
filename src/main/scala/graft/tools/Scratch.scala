package graft.tools
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    val t0 = System.nanoTime()
    val n = Dedup.duplicateClusters(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .select(col("doc_a"), col("doc_b"))).count()
    println(f"[scratch] q39 rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
