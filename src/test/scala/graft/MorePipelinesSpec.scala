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

  test("GarmentPurchasingFact: both branches, fulfillment fan-out, dialects") {
    import spark.implicits._
    val prs = Seq(
      (1L, "PR-1", ts("2020-03-01 00:00:00"), "maker",
        ts("2020-03-20 00:00:00"), "U-1", "sewing", "DV-1", "garment", false),
      (2L, "PR-2", ts("2020-03-02 00:00:00"), "pr'creator",
        ts("2020-03-25 00:00:00"), "U-2", "cutting", "DV-1", "garment", false)
    ).toDF("id", "no", "createdDate", "createdBy", "expectedDeliveryDate",
      "unitCode", "unitName", "divisionCode", "divisionName", "deleted")
    val pos = Seq(
      (1L, 11L, "PO-1", ts("2020-03-04 00:00:00"), "staff'x", false)
    ).toDF("prId", "id", "no", "createdDate", "createdBy", "deleted")
    val poItems = Seq(
      // full chain: EPO present, two fulfillments
      (11L, 101L, "FAB", "fabric", "P-1", "cot'ton", "EPO-1",
        Option(ts("2020-03-06 00:00:00")), Option(ts("2020-03-15 00:00:00")),
        "S-1", "supp'one", "USD", "$", Option(14000.0), "CASH",
        Option(10.0), "MTR", Option(2.0), Option(10.0)),
      // EPO missing, no fulfillments
      (11L, 102L, "EMB", "embroidery", "P-2", "thread", null,
        Option.empty[Timestamp], Option.empty[Timestamp],
        null, null, null, null, Option.empty[Double], null,
        Option(5.0), "PCS", Option(3.0), Option(5.0))
    ).toDF("poId", "id", "categoryCode", "categoryName", "productCode",
      "productName", "epoNo", "epoCreatedDate", "epoExpectedDeliveryDate",
      "supplierCode", "supplierName", "currencyCode", "currencySymbol",
      "currencyRate", "paymentMethod", "defaultQuantity", "defaultUomUnit",
      "pricePerDealUnit", "dealQuantity")
    val fulfillments = Seq(
      // early delivery, fully invoiced
      (101L, 1001L, "DO-1", Option(ts("2020-03-10 00:00:00")), "URN-1",
        Option(ts("2020-03-12 00:00:00")), "UPO-1",
        Option(ts("2020-03-14 00:00:00")), Option(2.5), Option(9.0),
        Option(ts("2020-04-01 00:00:00")), Option(0.0)),
      // LAST fulfillment (highest id): late vs the 03-15 promise, and
      // missing URN/UPO dates → the literal-0 day-count defaults
      (101L, 1002L, "DO-2", Option(ts("2020-03-17 00:00:00")), null,
        Option.empty[Timestamp], null, Option.empty[Timestamp],
        Option.empty[Double], Option.empty[Double],
        Option.empty[Timestamp], Option.empty[Double])
    ).toDF("poItemId", "fulfillmentId", "deliveryOrderNo",
      "deliveryOrderDate", "unitReceiptNoteNo", "unitReceiptNoteDate",
      "interNoteNo", "interNoteDate", "interNotePrice", "interNoteQuantity",
      "interNoteDueDate", "unitReceiptNoteDeliveredQuantity")
    val prItems = Seq(
      (2L, 201L, "BTN", "buttons", "P-9", "button'9", Option(100.0), "PCS")
    ).toDF("prId", "id", "categoryCode", "categoryName", "productCode",
      "productName", "quantity", "uomUnit")

    val fact = GarmentPurchasingFact.transform(Map(
      "garmentPurchaseRequests" -> prs, "garmentPurchaseOrders" -> pos,
      "garmentPOItems" -> poItems, "garmentFulfillments" -> fulfillments,
      "garmentPRItems" -> prItems))
    val rows = fact.collect()

    // item 101 fans out to its two fulfillments
    val i101 = rows.filter(_.getAs[Long]("po_item_id") == 101L)
    assert(i101.length === 2)
    // BOTH rows take the on-time status of the LAST fulfillment
    // (03-17 > promise 03-15 → late), even the early delivery's row
    assert(i101.map(_.getAs[String]("ontime_status")).toSet ===
      Set("Tidak Tepat Waktu"))
    assert(i101.forall(_.getAs[String]("category_type") === "Bahan Baku"))
    assert(i101.forall(_.getAs[Double]("total_price") === 10.0 * 2.0 * 14000.0))
    assert(i101.forall(_.getAs[String]("supplier_name") === "supp\"one"))
    // WIB-shifted diffs: PR 03-01 → PO 03-04 = 3; EPO 03-06 → DO-2 03-17 = 11
    assert(i101.forall(_.getAs[Int]("purchase_request_days") === 3))
    val f2 = i101.find(_.getAs[String]("delivery_order_no") == "DO-2").get
    assert(f2.getAs[Int]("delivery_order_days") === 11)
    // fulfillment exists but URN/UPO dates are absent → literal 0s
    assert(f2.getAs[Int]("unit_receipt_note_days") === 0)
    assert(f2.getAs[Int]("unit_payment_order_days") === 0)
    assert(f2.getAs[Int]("purchase_order_days") === 0)
    assert(f2.getAs[String]("unit_receipt_note_days_range") === null)
    val f1 = i101.find(_.getAs[String]("delivery_order_no") == "DO-1").get
    assert(f1.getAs[Int]("unit_receipt_note_days") === 2)
    assert(f1.getAs[String]("invoice_price") === "2.5")
    // `!= undefined`: the zero delivered quantity survives as "0.0"
    assert(f1.getAs[String]("unit_receipt_note_delivered_quantity") === "0.0")

    // item 102: no fulfillments → ONE row, day counts NULL (not 0)
    val i102 = rows.filter(_.getAs[Long]("po_item_id") == 102L)
    assert(i102.length === 1)
    assert(i102.head.get(i102.head.fieldIndex("delivery_order_days")) === null)
    assert(i102.head.getAs[String]("supplier_name") === null)
    assert(i102.head.getAs[String]("category_type") === "Jasa")
    assert(i102.head.get(i102.head.fieldIndex("total_price")) === null)

    // PR-2 has no PO: the PR-only branch fans out its own items
    val i201 = rows.filter(_.getAs[Long]("po_item_id") == 201L)
    assert(i201.length === 1)
    assert(i201.head.getAs[String]("pr_no") === "PR-2")
    assert(i201.head.getAs[String]("po_no") === null)
    assert(i201.head.getAs[String]("purchasing_staff_name") === "pr\"creator")
    assert(i201.head.getAs[Double]("purchase_quantity") === 100.0)
    assert(i201.head.getAs[String]("category_type") === "Accessories")
    assert(i201.head.get(i201.head.fieldIndex("purchase_request_days")) === null)
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
