package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Is the q138 tail executor work or driver-side planning? Times the
  * analysis/optimization/planning of the full chain separately from
  * its execution. Usage: runMain graft.tools.PlanCost [sfDir] */
object PlanCost {
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

    val q = graft.queries.Registry.all.find(_.name == "q138_curation_v3").get
    for (round <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = q.build(spark, dir)   // runs the pins + model fits
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + planning
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count() // execution (incl. AQE re-planning)
      val t3 = System.nanoTime()
      println(f"[plancost] r$round build=${(t1 - t0) / 1e9}%6.2f s " +
        f"plan=${(t2 - t1) / 1e9}%6.2f s exec=${(t3 - t2) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
