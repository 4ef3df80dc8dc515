package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode

import graft.control.WatermarkManager
import graft.runner.{Main, Pipelines}
import graft.sources.ParquetConnector

/** The operational entry point (`graft.runner.Main`) run exactly as an
  * operator would: `pembelian` by its reference alias, against parquet
  * fixture sources, twice — proving the full wiring (connector →
  * watermark → transform → MERGE → run log) and idempotence via the
  * control table. */
class RunnerSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("runner: pembelian twice over parquet fixtures, idempotent via control table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-runner").toString
    val lake = ParquetConnector(s"$dir/lake")
    lake.write(Seq(
      ("PR-1", "BAHAN BAKU", ts("2020-01-01 00:00:00"),
        ts("2020-01-10 00:00:00"), 10.0, 2.5, false,
        ts("2020-01-02 00:00:00"), "USD"),
      ("PR-2", "SPAREPART", ts("2020-01-05 00:00:00"),
        ts("2020-01-20 00:00:00"), 4.0, 1.0, false,
        ts("2020-01-06 00:00:00"), "IDR"),
      ("PR-3", "BAHAN BAKU", ts("2020-02-01 00:00:00"),
        ts("2020-02-15 00:00:00"), 7.0, 3.0, true,
        ts("2020-02-02 00:00:00"), "EUR")
    ).toDF("no", "categoryName", "createdUtc", "expectedDeliveryDate",
      "dealQuantity", "pricePerDealUnit", "isDeleted", "lastmodifiedutc",
      "currencyCode"), "purchaserequests", SaveMode.Overwrite)
    lake.write(Seq(
      ("PR-1", "PO-1", ts("2020-01-04 00:00:00")),
      ("PR-3", "PO-3", ts("2020-02-20 00:00:00"))
    ).toDF("prNo", "poNo", "createdUtc"), "internalpurchaseorders",
      SaveMode.Overwrite)
    lake.write(Seq(
      ("USD", 14000.0, "US Dollar"), ("USD", 13000.0, "US Dollar old"),
      ("EUR", 16000.0, "Euro")
    ).toDF("code", "rate", "description"), "currencies", SaveMode.Overwrite)

    def invoke(): Unit = Main.main(Array("pembelian",
      "--sources", s"$dir/lake", "--warehouse", s"$dir/dwh",
      "--control", s"$dir/dwh/control"))

    invoke()
    val fact = spark.read.parquet(s"$dir/dwh/purchasing-fact")
    assert(fact.count() === 3)
    assert(fact.filter("pr_no = 'PR-1'").collect().head
      .getAs[Double]("total_price") === 10.0 * 2.5 * 14000.0)
    // S9: pembelian maintains the shared dim-time alongside the fact
    assert(spark.read.parquet(s"$dir/dwh/dim-time").count() > 0)

    // second invocation: watermark advanced past every fixture row, so
    // the incremental batch is empty and the fact must not change
    invoke()
    assert(spark.read.parquet(s"$dir/dwh/purchasing-fact").count() === 3)

    val control = new WatermarkManager(spark, s"$dir/dwh/control")
    assert(control.log.filter("status = 'Successful'").count() === 2)
    assert(control.lastWatermark("purchasing-fact").after(control.epoch))
  }

  test("runner: migration-log through the jsonl doc-store URI") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-runner-ds").toString
    graft.sources.JsonLinesConnector(s"$dir/mongo").write(Seq(
      ("fact-pembelian", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00"),
        "5.00 minutes", "Successful"),
      ("fact-pembelian", ts("2024-01-02 00:00:00"), ts("2024-01-02 00:04:00"),
        "4.00 minutes", "success"),
      ("fact-kanban", ts("2024-02-01 00:00:00"), ts("2024-02-01 00:09:00"),
        "9.00 minutes", "Failed: x")
    ).toDF("description", "start", "finish", "executionTime", "status"),
      "externalLog", SaveMode.Overwrite)

    Main.main(Array("migration-log",
      "--sources", s"jsonl:$dir/mongo",
      "--warehouse", s"$dir/dwh", "--control", s"$dir/dwh/control"))
    val fact = spark.read.parquet(s"$dir/dwh/migration-log-sync")
      .collect().map(r => r.getAs[String]("description") ->
        r.getAs[java.sql.Timestamp]("finish")).toMap
    // latest successful run per pipeline; failures never surface
    assert(fact === Map("fact-pembelian" -> ts("2024-01-02 00:04:00")))
  }

  test("runner failure path: missing source logs a Failed row, nonzero count") {
    val dir = Files.createTempDirectory("graft-runner-fail").toString
    // empty lake: the pipeline's source table does not exist
    val failures = Main.run(Array("pembelian",
      "--sources", s"$dir/empty-lake",
      "--warehouse", s"$dir/dwh", "--control", s"$dir/dwh/control"))
    assert(failures === 1)
    val control = new WatermarkManager(spark, s"$dir/dwh/control")
    assert(control.log.filter("status like 'Failed%'").count() === 1)
    // the watermark never advanced — the next run still sees everything
    assert(control.lastWatermark("purchasing-fact") === control.epoch)
  }

  test("pipeline registry: every engine pipeline addressable, aliases resolve") {
    assert(Pipelines.all.map(_.name).distinct.size === Pipelines.all.size)
    assert(Pipelines.byName("pembelian").name === "purchasing-fact")
    assert(Pipelines.byName("total-hutang-fact").name === "total-hutang-fact")
    Pipelines.aliases.values.foreach(v =>
      assert(Pipelines.all.exists(_.name == v), s"alias target $v missing"))
    intercept[IllegalArgumentException](Pipelines.byName("nope"))
  }
}
