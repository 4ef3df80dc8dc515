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

  test("SQL Server dialect emits the reference warehouse's statement shapes") {
    import JdbcMergeSink.MergeDialect
    val d = MergeDialect.forUrl(
      "jdbc:sqlserver://dwh.example.invalid;databaseName=DWH")
    assert(d === MergeDialect.SqlServer)

    // bracket quoting, ] escaped by doubling
    assert(d.quote("Total Amount") === "[Total Amount]")
    assert(d.quote("odd]name") === "[odd]]name]")

    // T-SQL has no CREATE TABLE AS; staging is SELECT INTO with a
    // false predicate
    assert(d.createStaging("DL_Fact_Pembelian", "DL_Fact_Pembelian_TEMP") ===
      "SELECT * INTO DL_Fact_Pembelian_TEMP FROM DL_Fact_Pembelian WHERE 1 = 0")

    // the full MERGE text, semicolon-terminated as T-SQL requires
    assert(JdbcMergeSink.mergeSql(d, "fact", "fact_TEMP",
      Seq("id", "name", "amount"), Seq("id")) ===
      "MERGE INTO fact t USING fact_TEMP s ON t.[id] = s.[id] " +
        "WHEN MATCHED THEN UPDATE SET [name] = s.[name], [amount] = s.[amount] " +
        "WHEN NOT MATCHED THEN INSERT ([id], [name], [amount]) " +
        "VALUES (s.[id], s.[name], s.[amount]);")

    // composite keys land in the ON conjunction, not the UPDATE SET
    assert(JdbcMergeSink.mergeSql(d, "f", "f_TEMP",
      Seq("k1", "k2", "v"), Seq("k1", "k2")) ===
      "MERGE INTO f t USING f_TEMP s ON t.[k1] = s.[k1] AND t.[k2] = s.[k2] " +
        "WHEN MATCHED THEN UPDATE SET [v] = s.[v] " +
        "WHEN NOT MATCHED THEN INSERT ([k1], [k2], [v]) " +
        "VALUES (s.[k1], s.[k2], s.[v]);")

    // all-key tables degrade to insert-only (no UPDATE SET clause)
    assert(JdbcMergeSink.mergeSql(d, "f", "f_TEMP", Seq("k"), Seq("k")) ===
      "MERGE INTO f t USING f_TEMP s ON t.[k] = s.[k] " +
        "WHEN NOT MATCHED THEN INSERT ([k]) VALUES (s.[k]);")

    // the ANSI dialect (Derby here) keeps double quoting and NO
    // terminator — Derby rejects a trailing semicolon in executeUpdate
    val ansi = MergeDialect.forUrl(url)
    assert(JdbcMergeSink.mergeSql(ansi, "f", "f_TEMP",
      Seq("k", "v"), Seq("k")) ===
      "MERGE INTO f t USING f_TEMP s ON t.\"k\" = s.\"k\" " +
        "WHEN MATCHED THEN UPDATE SET \"v\" = s.\"v\" " +
        "WHEN NOT MATCHED THEN INSERT (\"k\", \"v\") VALUES (s.\"k\", s.\"v\")")
  }

  test("chunked merge emits per-key-range statements in both dialects") {
    import JdbcMergeSink.MergeDialect
    val ss = MergeDialect.SqlServer
    // SQL Server: the range lives in a USING subquery so the optimizer
    // can seek the staging index; closing chunk is inclusive
    assert(JdbcMergeSink.mergeChunkSql(ss, "fact", "fact_TEMP",
      Seq("id", "name"), Seq("id"), lo = 0L, hi = 100L, closing = false) ===
      "MERGE INTO fact t USING (SELECT * FROM fact_TEMP " +
        "WHERE [id] >= 0 AND [id] < 100) s ON t.[id] = s.[id] " +
        "WHEN MATCHED THEN UPDATE SET [name] = s.[name] " +
        "WHEN NOT MATCHED THEN INSERT ([id], [name]) " +
        "VALUES (s.[id], s.[name]);")
    assert(JdbcMergeSink.mergeChunkSql(ss, "fact", "fact_TEMP",
      Seq("id", "name"), Seq("id"), lo = 100L, hi = 250L, closing = true) ===
      "MERGE INTO fact t USING (SELECT * FROM fact_TEMP " +
        "WHERE [id] >= 100 AND [id] <= 250) s ON t.[id] = s.[id] " +
        "WHEN MATCHED THEN UPDATE SET [name] = s.[name] " +
        "WHEN NOT MATCHED THEN INSERT ([id], [name]) " +
        "VALUES (s.[id], s.[name]);")
    // ANSI/Derby: no subquery MERGE sources, so the range refines both
    // WHEN clauses — rows outside it match no actionable clause
    val ansi = MergeDialect.forUrl(url)
    assert(JdbcMergeSink.mergeChunkSql(ansi, "fact", "fact_TEMP",
      Seq("id", "name"), Seq("id"), lo = 0L, hi = 100L, closing = false) ===
      "MERGE INTO fact t USING fact_TEMP s ON t.\"id\" = s.\"id\" " +
        "WHEN MATCHED AND s.\"id\" >= 0 AND s.\"id\" < 100 " +
        "THEN UPDATE SET \"name\" = s.\"name\" " +
        "WHEN NOT MATCHED AND s.\"id\" >= 0 AND s.\"id\" < 100 " +
        "THEN INSERT (\"id\", \"name\") VALUES (s.\"id\", s.\"name\")")
  }

  test("chunked merge: same end state and idempotence as single-statement") {
    import spark.implicits._
    val v1 = (1L to 20L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "amount")
    JdbcConnector(url).write(v1, "factc", SaveMode.Overwrite)

    // updates half the keys, inserts 5 new ones, spread across ranges
    val batch = (Seq(2L, 5L, 9L, 13L, 17L).map(i => (i, s"u$i", i * 10.0)) ++
      (21L to 25L).map(i => (i, s"n$i", i * 1.0)))
      .toDF("id", "name", "amount")
    val touched = JdbcMergeSink.upsert(batch, url, "factc", Seq("id"),
      chunks = 4)
    assert(touched === 10) // every staging row acted in exactly one chunk

    def state() = JdbcConnector(url).read(spark, "factc").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("amount")).toMap
    val expect = ((1L to 20L).map(i => i -> i * 1.0).toMap
      ++ Seq(2L, 5L, 9L, 13L, 17L).map(i => i -> i * 10.0)
      ++ (21L to 25L).map(i => i -> i * 1.0))
    assert(state() === expect)

    // idempotent rerun; staging left empty; more chunks than keys is fine
    JdbcMergeSink.upsert(batch, url, "factc", Seq("id"), chunks = 64)
    assert(state() === expect)
    assert(JdbcConnector(url).read(spark, "factc_TEMP").count() === 0L)

    // non-integral first key is rejected up front, not at the warehouse
    val bad = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      JdbcMergeSink.upsert(bad, url, "factc", Seq("k"), chunks = 2)
    }
  }

  test("chunked merge: keys within width of Long.MaxValue are not lost") {
    import spark.implicits._
    // keys straddling the top of the Long range: a naive open upper
    // bound `cLo + width` wraps negative on .toLong and the top chunk
    // merges nothing, after which DELETE FROM staging silently drops
    // the rows. Every key here must survive the chunked merge.
    val ids = Seq(Long.MaxValue - 9, Long.MaxValue - 5, Long.MaxValue - 1,
      Long.MaxValue)
    val seed = Seq((Long.MaxValue - 9, "old", 0.0)).toDF("id", "name", "amount")
    JdbcConnector(url).write(seed, "facthi", SaveMode.Overwrite)
    val batch = ids.map(i => (i, s"n$i", 1.0)).toDF("id", "name", "amount")
    val touched = JdbcMergeSink.upsert(batch, url, "facthi", Seq("id"),
      chunks = 8)
    assert(touched === 4) // 1 update + 3 inserts, none dropped
    val got = JdbcConnector(url).read(spark, "facthi").collect()
      .map(_.getAs[Long]("id")).toSet
    assert(got === ids.toSet)

    // rerun is idempotent at the range edge too
    JdbcMergeSink.upsert(batch, url, "facthi", Seq("id"), chunks = 8)
    assert(JdbcConnector(url).read(spark, "facthi").count() === 4L)
  }

  test("chunked merge: NULL merge keys fail fast, staging not silently drained") {
    import spark.implicits._
    // nullable id so the created Derby column accepts the NULL-key row
    // (the violation must reach the chunked merge itself)
    val seed = Seq((java.lang.Long.valueOf(1L), "one", 1.0))
      .toDF("id", "name", "amount")
    JdbcConnector(url).write(seed, "factnull", SaveMode.Overwrite)
    val batch = Seq((java.lang.Long.valueOf(2L), "two", 2.0),
      (null.asInstanceOf[java.lang.Long], "ghost", 9.0))
      .toDF("id", "name", "amount")
    val e = intercept[IllegalArgumentException] {
      JdbcMergeSink.upsert(batch, url, "factnull", Seq("id"), chunks = 4)
    }
    assert(e.getMessage.contains("NULL"))
    // the transaction rolled back: fact untouched
    val got = JdbcConnector(url).read(spark, "factnull").collect()
      .map(_.getAs[Long]("id")).toSet
    assert(got === Set(1L))
  }

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
