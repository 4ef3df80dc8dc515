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
    val sig = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64)
    time("sig")(println(sig.count()))
    val q36 = Dedup.minHashCandidates(docs, "doc_id", "text", 3, 64, 8)
      .filter(col("est_jaccard") >= 0.5)
    time("q36 full")(println(q36.count()))
    spark.stop()
  }
}
