package graft.tools
import graft.core.Sessions
import graft.SparkEntry
/** Dump formatted physical plans for plan-shape review (pushdown,
  * broadcast, codegen spans). Usage: runMain graft.tools.Plans [names...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "plans")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q03_incremental_scan", "q05_join_chain", "q06_broadcast_dim")
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
