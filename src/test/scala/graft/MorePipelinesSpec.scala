package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.{GarmentPurchasingFact, MigrationLogSync, SalesContractFact}

class MorePipelinesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("SalesContractFact: three branches union into one fact with discriminator") {
    import spark.implicits._
    def contracts(prefix: String): DataFrame = Seq(
      (s"$prefix-1", "BuyerA", ts("2020-01-01 00:00:00"), "mat", "con", "yrn",
        "110", "YDS", 100.0, 5000.0)
    ).toDF("contractNo", "buyerName", "createdUtc", "material",
      "construction", "yarn", "width", "uom", "orderQuantity", "amount")
    val fact = SalesContractFact.transform(Map(
      "spinningContracts" -> contracts("SP"),
      "weavingContracts" -> contracts("WV"),
      "fpContracts" -> contracts("FP")))
    val rows = fact.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("production_type")).sorted.toSeq ===
      Seq("Finishing Printing", "Spinning", "Weaving"))
    val sp = fact.filter(col("contract_no") === "SP-1").collect().head
    assert(sp.getAs[String]("construction_string") === "mat con yrn 110")
    assert(math.abs(sp.getAs[Double]("order_qty_meters") - 91.44) < 1e-9)
  }

  test("SalesContractFact: construction string nulls when any part missing") {
    import spark.implicits._
    val c = Seq(("C-1", "B", ts("2020-01-01 00:00:00"),
        null.asInstanceOf[String], "con", "yrn", "110", "MTR", 10.0, 1.0))
      .toDF("contractNo", "buyerName", "createdUtc", "material",
        "construction", "yarn", "width", "uom", "orderQuantity", "amount")
    val empty = c.filter(lit(false))
    val fact = SalesContractFact.transform(Map(
      "spinningContracts" -> c, "weavingContracts" -> empty,
      "fpContracts" -> empty))
    assert(fact.collect().head.getAs[String]("construction_string") === null)
  }

  test("GarmentPurchasingFact: last fulfillment + as-of rate + defaults") {
    import spark.implicits._
    val items = Seq(
      (1L, "SN-1", "FAB", ts("2020-03-10 00:00:00"), 10.0, 2.0),
      (2L, "SN-2", "EMB", ts("2020-03-15 00:00:00"), 5.0, 3.0),
      (3L, "SN-3", "BTN", ts("2020-03-20 00:00:00"), 1.0, 1.0)
    ).toDF("id", "poSerialNumber", "categoryCode", "shipmentDate",
      "quantity", "pricePerUnit")
    val fulfillments = Seq(
      (10L, 1L, ts("2020-03-08 00:00:00"), "USD"), // earlier
      (11L, 1L, ts("2020-03-12 00:00:00"), "USD"), // last → late
      (12L, 2L, ts("2020-03-14 00:00:00"), "EUR")  // on time
    ).toDF("fulfillmentId", "poItemId", "deliveryOrderDate", "doCurrencyCode")
    val currencies = Seq(
      ("USD", ts("2020-03-01 00:00:00"), 14000.0),
      ("USD", ts("2020-03-11 00:00:00"), 15000.0), // as-of pick for item 1
      ("USD", ts("2020-03-13 00:00:00"), 16000.0)  // after DO date → ignored
    ).toDF("code", "date", "rate")

    val fact = GarmentPurchasingFact.transform(Map(
      "garmentPOItems" -> items, "fulfillments" -> fulfillments,
      "garmentCurrencies" -> currencies))
    val byId = fact.collect().map(r => r.getAs[Long]("po_item_id") -> r).toMap

    assert(byId(1L).getAs[String]("category_type") === "Bahan Baku")
    assert(byId(2L).getAs[String]("category_type") === "Jasa")
    assert(byId(3L).getAs[String]("category_type") === "Accessories")
    // item 1: last fulfillment 03-12 > shipment 03-10 → late; rate 15000
    assert(byId(1L).getAs[String]("ontime_status") === "Tidak Tepat Waktu")
    assert(byId(1L).getAs[Double]("total_price_idr") === 10.0 * 2.0 * 15000.0)
    // item 2: EUR has no rate → default 1
    assert(byId(2L).getAs[Double]("total_price_idr") === 5.0 * 3.0 * 1.0)
    assert(byId(2L).getAs[String]("ontime_status") === "Tepat Waktu")
    // item 3: no fulfillment at all → preserved with null status
    assert(byId(3L).getAs[String]("ontime_status") === null)
  }

  test("MigrationLogSync: latest successful record per description") {
    import spark.implicits._
    val log = Seq(
      ("pembelian", ts("2020-01-01 00:00:00"), ts("2020-01-01 00:05:00"), "5 minutes", "Successful"),
      ("pembelian", ts("2020-01-02 00:00:00"), ts("2020-01-02 00:04:00"), "4 minutes", "success"),
      ("pembelian", ts("2020-01-03 00:00:00"), ts("2020-01-03 00:09:00"), "9 minutes", "Failed"),
      ("kanban", ts("2020-01-01 00:00:00"), ts("2020-01-01 00:02:00"), "2 minutes", "Successful")
    ).toDF("description", "start", "finish", "executionTime", "status")
    val got = MigrationLogSync.transform(Map("externalLog" -> log))
      .collect().map(r => r.getString(0) -> r.getTimestamp(2)).toMap
    assert(got === Map(
      "pembelian" -> ts("2020-01-02 00:04:00"), // latest successful, not Failed
      "kanban" -> ts("2020-01-01 00:02:00")))
  }
}
