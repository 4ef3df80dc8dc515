package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.{ConnectorRegistry, JdbcConnector, ParquetConnector}

/** Exercises the real JDBC code path against embedded Derby (the same
  * engine Spark ships for its metastore) — write, plain read,
  * partitioned parallel read, and predicate pushdown into the remote
  * query. */
class ConnectorSpec extends SparkSpec {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def seed(): Unit = {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"name$i", i * 10.0))
      .toDF("id", "name", "amount")
    JdbcConnector(url).write(df, "items", SaveMode.Overwrite)
  }

  test("JDBC write → read roundtrip (embedded Derby)") {
    seed()
    val got = JdbcConnector(url).read(spark, "items")
    assert(got.count() === 100)
    assert(got.columns.map(_.toLowerCase).sorted === Array("amount", "id", "name"))
  }

  test("partitioned JDBC read slices by bounds and returns everything") {
    val got = JdbcConnector(url, partitionColumn = Some("id"),
      numPartitions = 4).read(spark, "items")
    assert(got.rdd.getNumPartitions === 4)
    assert(got.count() === 100)
    assert(got.agg(sum(col("id"))).collect().head.getLong(0) === 5050L)
  }

  test("filters push down into the remote JDBC query") {
    val df = JdbcConnector(url).read(spark, "items")
      .filter(col("id") > 90)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      plan)
    assert(df.count() === 10)
  }

  test("registry binds logical source names; parquet and jdbc coexist") {
    val reg = ConnectorRegistry(Map(
      "purchasing" -> JdbcConnector(url),
      "lake" -> ParquetConnector("/root/testdata/sf0.001")))
    assert(reg.read(spark, "purchasing", "items").count() === 100)
    assert(reg.read(spark, "lake", "region").count() === 5)
    intercept[IllegalArgumentException](reg.read(spark, "nope", "x"))
  }
}
