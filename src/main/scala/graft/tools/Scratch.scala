package graft.tools
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    val sets = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh_set"))
      .filter(size(col("sh_set")) > 0)
    time("sets count")(println(sets.count()))
    val sh = sets.select(col("doc_id"), explode(col("sh_set")).as("s"))
    time("shingle rows")(println(sh.count()))
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    time("dfreq")(println(dfreq.count()))
    val wPos = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    val prefix = sh.join(dfreq, "s")
      .withColumn("pos", row_number().over(wPos))
      .withColumn("set_size", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("set_size") - ceil(col("set_size") * 0.3 - 1e-9) + 1)
      .select("doc_id", "s")
    time("prefix rows")(println(prefix.count()))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("cand pairs")(println(cand.count()))
    val verified = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh_set").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh_set").as("set_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("set_a"), col("set_b"))).cast("long").as("n_common"),
        (size(col("set_a")) + size(col("set_b"))).as("size_sum"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_common").cast("double") / (col("size_sum") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
    time("verified")(println(verified.count()))
    spark.stop()
  }
}
