package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.control.WatermarkManager
import graft.pipelines.{PipelineRunner, PurchasingFact}
import graft.sink.UpsertWriter

class PipelineSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixtures(upTo: String): Map[String, DataFrame] = {
    import spark.implicits._
    val prs = Seq(
      ("PR-1", "BAHAN BAKU", ts("2020-01-01 00:00:00"),
        ts("2020-01-10 00:00:00"), 10.0, 2.5, false, ts("2020-01-02 00:00:00"), "USD"),
      ("PR-2", "SPAREPART", ts("2020-01-05 00:00:00"),
        ts("2020-01-20 00:00:00"), 4.0, 1.0, false, ts("2020-01-06 00:00:00"), "IDR"),
      ("PR-3", "BAHAN BAKU", ts("2020-02-01 00:00:00"),
        ts("2020-02-15 00:00:00"), 7.0, 3.0, true, ts("2020-02-02 00:00:00"), "EUR")
    ).toDF("no", "categoryName", "createdUtc", "expectedDeliveryDate",
      "dealQuantity", "pricePerDealUnit", "isDeleted", "lastmodifiedutc",
      "currencyCode")
      .filter(org.apache.spark.sql.functions.col("lastmodifiedutc") <= ts(upTo))
    val ipos = Seq(
      ("PR-1", "PO-1", ts("2020-01-04 00:00:00")),
      ("PR-3", "PO-3", ts("2020-02-20 00:00:00"))
    ).toDF("prNo", "poNo", "createdUtc")
    val currencies = Seq(
      ("USD", 14000.0, "US Dollar"), ("USD", 13000.0, "US Dollar old"),
      ("EUR", 16000.0, "Euro")
    ).toDF("code", "rate", "description")
    Map("purchaserequests" -> prs, "internalpurchaseorders" -> ipos,
      "currencies" -> currencies)
  }

  test("PurchasingFact end-to-end: incremental run, merge, idempotence, watermark") {
    val dir = Files.createTempDirectory("graft-pipe").toString
    val control = new WatermarkManager(spark, s"$dir/control")
    val runner = new PipelineRunner(spark, control, s"$dir/warehouse")

    // first nightly run sees only January rows
    val n1 = runner.run(PurchasingFact, fixtures("2020-01-31 00:00:00"),
      Some(ts("2020-01-31 00:00:00")))
    assert(n1 === 2)
    val fact1 = spark.read.parquet(s"$dir/warehouse/purchasing-fact")
    val pr1 = fact1.filter("pr_no = 'PR-1'").collect().head
    assert(pr1.getAs[String]("po_no") === "PO-1")
    assert(pr1.getAs[Int]("pr_to_po_days") === 3)
    assert(pr1.getAs[String]("pr_to_po_bucket") === "0-30 hari")
    assert(pr1.getAs[String]("category_type") === "BAHAN BAKU")
    assert(pr1.getAs[String]("ontime_status") === "Tepat Waktu")
    // keep-first currency: highest rate wins per the declared tiebreak
    assert(pr1.getAs[Double]("total_price") === 10.0 * 2.5 * 14000.0)
    // PR-2: no PO, no currency → nulls + default rate 1
    val pr2 = fact1.filter("pr_no = 'PR-2'").collect().head
    assert(pr2.getAs[String]("po_no") === null)
    assert(pr2.getAs[Double]("total_price") === 4.0 * 1.0 * 1.0)

    // watermark advanced to run-1 start: second run ingests only Feb rows
    val n2 = runner.run(PurchasingFact, fixtures("2020-03-01 00:00:00"),
      Some(ts("2020-03-01 00:00:00")))
    assert(n2 === 3)

    // idempotence: re-running the same window leaves no duplicates (MERGE)
    val n3 = runner.run(PurchasingFact, fixtures("2020-03-01 00:00:00"),
      Some(ts("2020-03-01 00:00:00")))
    assert(n3 === 3)
    assert(control.lastWatermark(PurchasingFact.name).after(control.epoch))
  }

  test("PipelineRunner logs failures without advancing the watermark") {
    val dir = Files.createTempDirectory("graft-pipe-fail").toString
    val control = new WatermarkManager(spark, s"$dir/control")
    val runner = new PipelineRunner(spark, control, s"$dir/warehouse")
    intercept[Exception] {
      runner.run(PurchasingFact, _ => throw new RuntimeException("source down"))
    }
    assert(control.lastWatermark(PurchasingFact.name) === control.epoch)
    assert(control.log.filter("status like 'Failed%'").count() === 1)
  }

  test("UpsertWriter replaces matched keys and keeps the rest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/t"
    UpsertWriter.upsert(spark,
      Seq((1, "a"), (2, "b")).toDF("k", "v"), dir, Seq("k"))
    UpsertWriter.upsert(spark,
      Seq((2, "B"), (3, "c")).toDF("k", "v"), dir, Seq("k"))
    val got = spark.read.parquet(dir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }
}
