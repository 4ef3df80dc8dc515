package graft

import org.apache.spark.sql.functions._

/**
 * Bucketing = pre-shuffled storage: writing both join sides bucketed by
 * the join key lets Spark plan a SortMergeJoin with NO Exchange — the
 * co-located join that turns a repeated 100 TB shuffle into a one-time
 * layout cost. This spec proves the engine's tables support that layout
 * and that the plan actually drops the shuffles.
 */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // default warehouse dir (static conf); drop tables AND stale
    // locations (a fresh derby metastore forgets tables but the files
    // survive across JVMs)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    for (t <- Seq("b_orders", "b_lineitem")) {
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }

    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // disable broadcast so the planner must choose the shuffle-family
    // join — that's where bucketing removes the Exchange
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = try joined.queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // and the result is still correct
    assert(joined.count() ===
      spark.read.parquet(s"$dir/lineitem.parquet").count())
  }
}
