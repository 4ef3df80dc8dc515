package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sink.JdbcMergeSink
import graft.sources.JdbcConnector

/** The reference's real S8 against a real SQL engine: staging table +
  * single-transaction MERGE on embedded Derby
  * (`/root/reference/Pembelian/run.js:299-379`). */
class JdbcMergeSpec extends SparkSpec {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def readFact() = JdbcConnector(url).read(spark, "fact")
    .collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("name"), r.getAs[Double]("amount"))).toMap

  test("JDBC MERGE: keyed replace + insert semantics, idempotent") {
    import spark.implicits._
    val v1 = Seq((1L, "one", 10.0), (2L, "two", 20.0)).toDF("id", "name", "amount")
    JdbcConnector(url).write(v1, "fact", SaveMode.Overwrite)

    // batch updates key 2, inserts key 3
    val batch = Seq((2L, "two'", 22.0), (3L, "three", 30.0))
      .toDF("id", "name", "amount")
    val touched = JdbcMergeSink.upsert(batch, url, "fact", Seq("id"))
    assert(touched === 2)
    assert(readFact() === Map(1L -> ("one", 10.0), 2L -> ("two'", 22.0),
      3L -> ("three", 30.0)))

    // idempotence: same batch again → same end state
    JdbcMergeSink.upsert(batch, url, "fact", Seq("id"))
    assert(readFact() === Map(1L -> ("one", 10.0), 2L -> ("two'", 22.0),
      3L -> ("three", 30.0)))
  }

  test("JDBC MERGE: staging table is reused and left empty") {
    import spark.implicits._
    val batch = Seq((4L, "four", 40.0)).toDF("id", "name", "amount")
    JdbcMergeSink.upsert(batch, url, "fact", Seq("id"))
    val staged = JdbcConnector(url).read(spark, "fact_TEMP").count()
    assert(staged === 0L)
    assert(readFact().keySet.contains(4L))
  }

  test("JDBC MERGE: composite keys") {
    import spark.implicits._
    // pre-create with VARCHAR keys (Spark's Derby dialect maps StringType
    // to CLOB, which SQL can't compare — real DWH targets are VARCHAR,
    // like the reference's [Nomor PR] etc.)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE fact2 (\"grp\" VARCHAR(16), \"seq\" BIGINT, \"x\" DOUBLE)")
    finally conn.close()
    val v1 = Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("grp", "seq", "x")
    JdbcConnector(url).write(v1, "fact2", SaveMode.Append)
    val batch = Seq(("a", 2L, 22.0), ("b", 1L, 9.0)).toDF("grp", "seq", "x")
    JdbcMergeSink.upsert(batch, url, "fact2", Seq("grp", "seq"))
    val got = JdbcConnector(url).read(spark, "fact2").collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("seq")) -> r.getAs[Double]("x"))
      .toMap
    assert(got === Map(("a", 1L) -> 1.0, ("a", 2L) -> 22.0, ("b", 1L) -> 9.0))
  }
}
