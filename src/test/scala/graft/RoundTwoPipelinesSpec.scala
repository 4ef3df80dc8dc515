package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines._

/** Golden tests for the six reference pipelines ported in round 2:
  * MonitoringEvent, ProductionOrderStatus, DailyOperation (dual output),
  * FabricQC, TotalHutang, GarmentTotalHutang. */
class RoundTwoPipelinesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // ─────────────────── MonitoringEventFact ───────────────────

  test("MonitoringEventFact: D8/D9 across-midnight duration, C6 gates, lookups") {
    import spark.implicits._
    val events = Seq(
      // crosses midnight: 23:30:00Z → 00:30:00Z next day = 60 min
      ("", "EV-1", ts("2020-01-01 00:00:00"), 84600000L, 1800000L,
        ts("2020-01-02 00:00:00"), 1L, 10L, 100L, "it's late", "alice", false),
      // no machine/order/event match, no end date
      ("CART-9", "EV-2", ts("2020-03-05 00:00:00"), 0L, 3600000L,
        null.asInstanceOf[Timestamp], 99L, 99L, 999L, null, "bob", true)
    ).toDF("cartNumber", "code", "dateStart", "timeInMilisStart",
      "timeInMilisEnd", "dateEnd", "machineId", "productionOrderId",
      "machineEventId", "remark", "createdBy", "isDeleted")
    val machines = Seq((1L, "M-01", "good", "ACME", "o'brien loom",
      "dye'ing", "U-1", 5L, "Unit Satu", 2015)).toDF("id", "code",
      "condition", "manufacture", "name", "process", "unitCode",
      "unitDivisionId", "unitName", "year")
    val divisions = Seq((5L, "DIV-1", "Divisi Satu"))
      .toDF("id", "code", "name")
    val pos = Seq((10L, 20L, "ORD-1", "SC-1", ts("2020-02-01 00:00:00"),
      "printing", "wash", "cotton", 42.5, "MTR")).toDF("id", "buyerId",
      "orderNo", "salesContractNo", "deliveryDate", "orderTypeName",
      "processTypeName", "materialName", "orderQuantity", "uomUnit")
    val buyers = Seq((20L, "buyer 'x'", "B-1")).toDF("id", "name", "code")
    val mes = Seq((100L, 7, "jam'd", "downtime"))
      .toDF("id", "no", "name", "category")

    val fact = MonitoringEventFact.transform(Map(
      "monitoringEvents" -> events, "machines" -> machines,
      "divisions" -> divisions, "productionOrders" -> pos,
      "buyers" -> buyers, "machineEvents" -> mes))
    val byCode = fact.collect().map(r => r.getAs[String]("event_code") -> r).toMap

    val e1 = byCode("EV-1")
    // D9: duration computed across the date boundary → 60 min → range 1.0
    assert(e1.getAs[Double]("event_range") === 1.0)
    // D8+D1: 23:30 UTC + 7h = 06:30 WIB
    assert(e1.getAs[String]("event_start_time") === "06:30:00")
    assert(e1.getAs[String]("event_end_time") === "07:30:00")
    // C6: empty cart number → NULL
    assert(e1.getAs[String]("cart_number") === null)
    // T1 quote swap on names
    assert(e1.getAs[String]("machine_name") === "o\"brien loom")
    assert(e1.getAs[String]("buyer_name") === "buyer \"x\"")
    // T5: numeric event no and order quantity as strings
    assert(e1.getAs[String]("machine_event_no") === "7")
    assert(e1.getAs[String]("order_quantity") === "42.5")
    assert(e1.getAs[String]("division_code") === "DIV-1")
    assert(e1.getAs[String]("deleted") === "false")

    val e2 = byCode("EV-2")
    // C6 on the epoch: millis 0 is falsy → NULL time
    assert(e2.getAs[String]("event_start_time") === null)
    // missed lookups → NULL, not a crash (reference bug not reproduced)
    assert(e2.getAs[String]("machine_code") === null)
    assert(e2.getAs[String]("division_code") === null)
    assert(e2.getAs[String]("buyer_name") === null)
    // no dateEnd → no range (run.js:288)
    assert(e2.get(e2.fieldIndex("event_range")) === null)
    assert(e2.getAs[String]("cart_number") === "CART-9")

    // fact-schema parity: the reference-dead columns exist and are NULL
    // on every row (its own dataflow can never populate them)
    val dead = Seq("machine_step_process", "production_order_construction",
      "production_order_detail_code", "selected_production_order_detail_code")
    for (c <- dead; r <- Seq(e1, e2))
      assert(r.get(r.fieldIndex(c)) === null, s"$c must be null")
  }

  // ─────────────────── ProductionOrderStatusFact ───────────────────

  private def posFixtures = {
    import spark.implicits._
    val scs = Seq(
      ("SC-1", ts("2020-01-01 00:00:00"), 100.0, "YDS",
        ts("2020-06-01 00:00:00"), false),
      ("SC-2", ts("2020-01-02 00:00:00"), 50.0, "MTR",
        ts("2020-06-02 00:00:00"), false),
      ("SC-3", ts("2020-01-03 00:00:00"), 10.0, "MTR",
        ts("2020-06-03 00:00:00"), false)
    ).toDF("salesContractNo", "createdUtc", "orderQuantity", "uomUnit",
      "deliverySchedule", "isDeleted")
      .withColumn("orderTypeName", org.apache.spark.sql.functions.lit("printing"))
    val pos = Seq(
      ("SC-1", 1L, ts("2020-01-05 00:00:00"), "PO-1", 90.0, "YDS",
        ts("2020-05-01 00:00:00"), false),
      ("SC-2", 2L, ts("2020-01-06 00:00:00"), "PO-2", 45.0, "MTR",
        ts("2020-05-02 00:00:00"), false)
    ).toDF("salesContractNo", "id", "createdUtc", "orderNo",
      "orderQuantity", "uomUnit", "deliveryDate", "isDeleted")
    val kanbans = Seq(
      (1L, 11L, ts("2020-02-01 00:00:00"), "K-1", 20.0, "CART-1", "SC-1", false),
      (2L, 12L, ts("2020-02-02 00:00:00"), "K-2", 8.0, "CART-2", "SC-2", false)
    ).toDF("productionOrderId", "id", "createdUtc", "code", "cartQty",
      "cartCartNumber", "productionOrderSalesContractNo", "isDeleted")
    val dops = Seq(
      (11L, ts("2020-02-10 00:00:00"), "DOP-1", 55.0, false)
    ).toDF("kanbanId", "createdUtc", "code", "input", "isDeleted")
    val fqcs = Seq(
      ("K-1", 21L, ts("2020-03-01 00:00:00"), "FQC-1", false),
      ("K-2", 22L, ts("2020-03-02 00:00:00"), "FQC-2", false) // zero tests
    ).toDF("kanbanCode", "id", "dateIm", "code", "isDeleted")
    val tests = Seq(
      (21L, 31L, 12.0), (21L, 32L, 15.0)
    ).toDF("fabricQualityControlId", "id", "initLength")
    Map("fpSalesContracts" -> scs, "productionOrders" -> pos,
      "kanbans" -> kanbans, "dailyOperations" -> dops,
      "fabricQCs" -> fqcs, "fabricGradeTests" -> tests)
  }

  test("ProductionOrderStatusFact: fan-out/drop/preserve branch structure") {
    val fact = ProductionOrderStatusFact.transform(posFixtures)
    val rows = fact.collect()
    val bySc = rows.groupBy(_.getAs[String]("sales_contract_no"))

    // SC-1: QC with two grade tests → two rows, indexed 1,2
    assert(bySc("SC-1").length === 2)
    assert(bySc("SC-1").map(_.getAs[Int]("test_index")).sorted === Array(1, 2))
    assert(bySc("SC-1").map(_.getAs[Double]("fabric_qc_quantity")).sorted
      === Array(12.0, 15.0))
    // SC-2: QC exists but has ZERO tests → the contract row disappears
    assert(!bySc.contains("SC-2"))
    // SC-3: no PO chain at all → one row with null QC fields
    assert(bySc("SC-3").length === 1)
    val sc3 = bySc("SC-3").head
    assert(sc3.getAs[String]("production_order_no") === null)
    assert(sc3.get(sc3.fieldIndex("test_index")) === null)

    val sc1 = bySc("SC-1").head
    // M2 on the contract quantity: 100 YDS → 91.44
    assert(math.abs(sc1.getAs[Double]("sales_contract_quantity") - 91.44) < 1e-9)
    // kanban qty converted with the PO's uom (YDS): 20 → 18.288
    assert(math.abs(sc1.getAs[Double]("kanban_quantity") - 18.288) < 1e-9)
    assert(sc1.getAs[Double]("daily_operation_quantity") === 55.0)
  }

  // ─────────────────── DailyOperationFact (dual output) ───────────────────

  private def dailyOpFixtures = {
    import spark.implicits._
    val ops = Seq(
      (1L, "OP-1", "input", false, Option(2.5),
        Option(ts("2020-01-01 00:00:00")), Option(ts("2020-01-02 00:00:00")),
        Option(90.0), Option(100.0), Option("shift 'A'"),
        Option(ts("2020-01-01 01:00:00")), Option(ts("2020-01-01 09:00:00")),
        "K-1", 10L, 20L, Option(7L), Option("step x")),
      (2L, "OP-2", "output", false, Option.empty[Double],
        Option(ts("2020-01-03 00:00:00")),
        Option.empty[Timestamp], Option.empty[Double], Option(40.0),
        Option.empty[String], Option.empty[Timestamp],
        Option.empty[Timestamp], "K-9", 99L, 20L, Option.empty[Long],
        Option.empty[String])
    ).toDF("id", "code", "type", "isDeleted", "badOutput",
      "dateInput", "dateOutput", "goodOutput",
      "input", "shift", "timeInput", "timeOutput", "kanbanCode",
      "kanbanId", "machineId", "stepId", "stepProcess")
    val reasons = Seq(
      (1L, "BC-1", Option("torn 'edge'"), Option(5.0), Option("cut"),
        Option("re'do")),
      (1L, "BC-2", Option("stain"), Option.empty[Double],
        Option.empty[String], Option.empty[String])
    ).toDF("dailyOperationId", "badOutputCode", "badOutputReason",
      "length", "description", "action")
    val kanbans = Seq(
      (10L, "A", "CART-1", "CC-1", Option.empty[Double],
        Option(30.0), "printing but with an extremely long type name",
        "red'ish", "tpl", "MTR", "ORD-1", "SC-1")
    ).toDF("id", "grade", "cartCartNumber", "cartCode", "cartPcs",
      "cartQty", "productionOrderOrderTypeName",
      "selectedProductionOrderDetailColorRequest",
      "selectedProductionOrderDetailColorTemplate",
      "selectedProductionOrderDetailUomUnit", "productionOrderOrderNo",
      "productionOrderSalesContractNo")
    val instr = Seq((10L, "KI-1", "wash")).toDF("kanbanId", "code", "name")
    val machines = Seq((20L, "M-1", "ok", "ACME", 5000.0, "loom",
      "weave", 2015)).toDF("id", "code", "condition", "manufacture",
      "monthlyCapacity", "name", "process", "year")
    Map("dailyOperations" -> ops, "badOutputReasons" -> reasons,
      "kanbans" -> kanbans, "kanbanInstructions" -> instr,
      "machines" -> machines)
  }

  test("DailyOperationFact: T2 truncation, M4 zero defaults, join fan-out") {
    val fact = DailyOperationFact.transform(dailyOpFixtures)
    val rows = fact.collect()
    // OP-1 has two bad-output reasons → the left join fans out to 2 rows
    val op1 = rows.filter(_.getAs[String]("code") === "OP-1")
    assert(op1.length === 2)
    assert(op1.map(_.getAs[String]("action")).toSet === Set("re\"do", null))
    // description is PER-REASON (db.Description rides the join,
    // run.js:71) — each fan-out row carries its own reason's value
    assert(op1.map(_.getAs[String]("bad_output_description")).toSet ===
      Set("cut", null))
    assert(rows.filter(_.getAs[String]("code") === "OP-2")
      .forall(_.getAs[String]("bad_output_description") == null))
    val r = op1.head
    // T2: order type truncated to 24 chars
    assert(r.getAs[String]("order_type") === "printing but with an ext")
    assert(r.getAs[String]("order_type").length === 24)
    // M4: null cart pcs → 0, real qty carried
    assert(r.getAs[Double]("kanban_cart_pcs") === 0.0)
    assert(r.getAs[Double]("kanban_cart_qty") === 30.0)
    // T5+T2: machine year as 4-char string
    assert(r.getAs[String]("machine_year") === "2015")
    // D1: input time +7h WIB
    assert(r.getAs[String]("input_time") === "08:00:00")
    // gated conversions need the kanban uom
    assert(r.getAs[Double]("input_quantity_conversion") === 100.0)

    val op2 = rows.filter(_.getAs[String]("code") === "OP-2")
    assert(op2.length === 1)
    // no kanban match → conversion gate closes
    assert(op2.head.get(op2.head.fieldIndex("input_quantity_conversion")) === null)
    assert(op2.head.getAs[Double]("kanban_cart_pcs") === 0.0)
  }

  test("DailyOperationFact reasons: inner join, quote swap, length default") {
    val reasons = DailyOperationFact.transformReasons(dailyOpFixtures)
    val rows = reasons.collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[String]("daily_operation_code") === "OP-1"))
    val bc1 = rows.find(_.getAs[String]("bad_output_reason_code") == "BC-1").get
    assert(bc1.getAs[String]("reason") === "torn \"edge\"")
    assert(bc1.getAs[Double]("length") === 5.0)
    val bc2 = rows.find(_.getAs[String]("bad_output_reason_code") == "BC-2").get
    assert(bc2.getAs[Double]("length") === 0.0) // M4 default
  }

  // ─────────────────── FabricQCFact ───────────────────

  test("FabricQCFact: 3-level fan-out, A4 weighted score, zero-gate dialects") {
    import spark.implicits._
    val qcs = Seq(
      (1L, "QC-1", 10.0, ts("2020-01-01 00:00:00"), "S1", "G1", "op'r",
        "MN-1", "PO-1", "printing", "K-1", "C-1", "buyer", 100.0, "red",
        "2/1", "roll", "MTR", false, true),
      (2L, "QC-2", 10.0, ts("2020-01-02 00:00:00"), "S2", "G2", "op",
        "MN-2", "PO-2", "printing", "K-2", "C-2", "b", 50.0, "blue",
        "2/1", "roll", "MTR", false, false) // has a test but no criteria
    ).toDF("id", "code", "pointSystem", "dateIm", "shiftIm", "group",
      "operatorIm", "machineNoIm", "productionOrderNo",
      "productionOrderType", "kanbanCode", "cartNo", "buyer",
      "orderQuantity", "color", "construction", "packingInstruction",
      "uom", "isDeleted", "isUsed")
    val tests = Seq(
      // point system 10 → scores count
      (1L, 11L, "IM", "PCS-1", "A", 0.0, 0.0, 1.0, 2.0, 3.0, 95.0, 96.0,
        4.0, 5.0, 10.0, 6.0),
      // point system ≠ 10 → all score terms null → total 0
      (1L, 12L, "IM", "PCS-2", "B", 110.0, 10.0, 1.0, 2.0, 3.0, 95.0,
        96.0, 4.0, 5.0, 5.0, 6.0),
      (2L, 21L, "IM", "PCS-9", "A", 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
        1.0, 1.0, 10.0, 1.0)
    ).toDF("fabricQualityControlId", "id", "type", "pcsNo", "grade",
      "width", "initLength", "avalLength", "finalLength", "sampleLength",
      "fabricGradeTest", "finalGradeTest", "score", "finalScore",
      "pointSystem", "pointLimit")
    val criteria = Seq(
      (11L, "CR-1", "warp", "hole's", 2.0, 1.0, 0.0, 1.0),
      (11L, "CR-2", "weft", "stain", 0.0, 0.0, 0.0, 0.0),
      (12L, "CR-3", "warp", "x", 1.0, 1.0, 1.0, 1.0)
    ).toDF("fabricGradeTestId", "code", "group", "name", "scoreA",
      "scoreB", "scoreC", "scoreD")

    val fact = FabricQCFact.transform(Map("fabricQCs" -> qcs,
      "fabricGradeTests" -> tests, "criteria" -> criteria))
    val rows = fact.collect()
    // QC-2's test has no criteria → contributes nothing (inner ×2)
    assert(rows.forall(_.getAs[String]("qc_code") === "QC-1"))
    assert(rows.length === 3)

    val byCr = rows.map(r => r.getAs[String]("criteria_code") -> r).toMap
    // A4: 2*1 + 1*3 + 0*5 + 1*10 = 15 (zero-score term still counted)
    assert(byCr("CR-1").getAs[Double]("total_score") === 15.0)
    assert(byCr("CR-2").getAs[Double]("total_score") === 0.0)
    // test 12 has pointSystem 5 → every term nulls → JS null sum = 0
    assert(byCr("CR-3").getAs[Double]("total_score") === 0.0)
    // zero-gate dialects: width 0 KEPT, initLength 0 DROPPED (run.js:143-144)
    assert(byCr("CR-1").getAs[Double]("width") === 0.0)
    assert(byCr("CR-1").get(byCr("CR-1").fieldIndex("init_length")) === null)
    // width 110 on test 12 kept as-is
    assert(byCr("CR-3").getAs[Double]("width") === 110.0)
    // T1 in free text
    assert(byCr("CR-1").getAs[String]("criteria_name") === "hole\"s")
    assert(byCr("CR-1").getAs[String]("operator_im") === "op\"r")
  }

  // ─────────────────── TotalHutangFact ───────────────────

  test("TotalHutangFact: A5 counter, keep-first UPO, inline category type") {
    import spark.implicits._
    val urns = Seq(
      (1L, "URN-1", "Unit A", false, "alice"),
      (2L, "URN-2", "Unit B", false, "bob"),      // no UPO
      (3L, "URN-3", "Unit C", true, "carol"),     // deleted
      (4L, "URN-4", "Unit D", false, "dev"),      // test user
      (5L, "URN-5", "Unit E", false, null)        // SQL NOT IN drops NULL
    ).toDF("id", "urnNo", "unitName", "isDeleted", "createdBy")
    val items = Seq(
      (1L, 10.0, 3.0, 2.0, "prod 'one'", "P-1"),
      (1L, 20.0, 1.0, 1.5, "prod two", "P-2"),
      (2L, 5.0, 2.0, 1.0, "prod three", "P-3"),
      (3L, 9.0, 9.0, 9.0, "x", "P-X"),
      (4L, 9.0, 9.0, 9.0, "x", "P-X"),
      (5L, 9.0, 9.0, 9.0, "x", "P-X")
    ).toDF("urnId", "pricePerDealUnit", "deliveredQuantity",
      "currencyRate", "productName", "productCode")
    val upos = Seq(
      (1L, "UPO-1", ts("2020-01-10 00:00:00"), ts("2020-02-10 00:00:00"),
        "supp 'a'", "Bahan Baku", "Div 1"),
      (1L, "UPO-2", ts("2020-01-11 00:00:00"), ts("2020-02-11 00:00:00"),
        "supp b", "Sparepart", "Div 2") // second match ignored (keep-first)
    ).toDF("urnId", "upoNo", "date", "dueDate", "supplierName",
      "categoryName", "divisionName")

    val fact = TotalHutangFact.transform(Map("unitReceiptNotes" -> urns,
      "urnItems" -> items, "unitPaymentOrders" -> upos))
    val rows = fact.orderBy(col("row_id")).collect()

    // filters: deleted, test user, null creator all gone; URN-2 kept
    assert(rows.map(_.getAs[String]("urn_no")).toSet === Set("URN-1", "URN-2"))
    assert(rows.length === 3)
    // A5: contiguous 1-based counter in the declared order
    assert(rows.map(_.getAs[Long]("row_id")).toSeq === Seq(1L, 2L, 3L))
    val p1 = rows.find(_.getAs[String]("product_code") == "P-1").get
    // keep-first UPO (UPO-1 by upoNo), lower-compare category type
    assert(p1.getAs[String]("upo_no") === "UPO-1")
    assert(p1.getAs[String]("category_type") === "BAHAN BAKU")
    assert(p1.getAs[String]("supplier_name") === "supp \"a\"")
    // M1: 3 × 10 × 2
    assert(p1.getAs[Double]("total") === 60.0)
    // URN-2: no UPO → nulls, category type included
    val p3 = rows.find(_.getAs[String]("product_code") == "P-3").get
    assert(p3.getAs[String]("upo_no") === null)
    assert(p3.getAs[String]("category_type") === null)
    assert(p3.getAs[String]("unit_name") === "Unit B")
  }

  // ─────────────────── GarmentTotalHutangFact ───────────────────

  test("GarmentTotalHutangFact: as-of rate, default 1, C4 gate mismatch") {
    import spark.implicits._
    val notes = Seq(
      (false, "IN-1", ts("2020-03-15 00:00:00"), "USD",
        ts("2020-03-10 00:00:00"), "RO-1", "supp 'x'", 10.0, 3.0),
      (false, "IN-2", ts("2020-03-16 00:00:00"), "EUR",
        ts("2020-03-11 00:00:00"), "RO-2", "supp y", 5.0, 2.0),
      (false, "IN-3", ts("2020-03-17 00:00:00"), "USD",
        ts("2020-03-12 00:00:00"), "RO-9", "supp z", 4.0, 0.0)
    ).toDF("isDeleted", "inNo", "inDate", "currencyCode", "doDate",
      "roNo", "supplierName", "pricePerDealUnit", "quantity")
    val currencies = Seq(
      ("USD", ts("2020-03-01 00:00:00"), 14000.0, false),
      ("USD", ts("2020-03-09 00:00:00"), 15000.0, false), // as-of pick
      ("USD", ts("2020-03-11 00:00:00"), 16000.0, false), // after doDate
      ("USD", ts("2020-03-10 00:00:00"), 99999.0, true)   // deleted (P8)
    ).toDF("code", "date", "rate", "_IsDeleted")
    val prs = Seq(
      ("RO-1", 7L, "Fabric", 8L, "Unit G", false),
      ("RO-2", 9L, "Embroidery", 8L, "Unit H", false)
    ).toDF("rono", "categoryId", "categoryName", "unitId", "unitName",
      "isDeleted")
    val cats = Seq((7L, "FAB"), (9L, "EMB")).toDF("id", "code")
    val units = Seq((8L, "Garment Division"))
      .toDF("id", "divisionName")

    val fact = GarmentTotalHutangFact.transform(Map(
      "internNotes" -> notes, "garmentCurrencies" -> currencies,
      "purchaseRequests" -> prs, "garmentCategories" -> cats,
      "units" -> units))
    val byNo = fact.collect().map(r => r.getAs[String]("intern_note_no") -> r).toMap

    // J8: rate at-or-before doDate 03-10 → 15000 (03-09), deleted row skipped
    assert(byNo("IN-1").getAs[Double]("deal_rate") === 15000.0)
    assert(byNo("IN-1").getAs[Double]("total_price") === 15000.0 * 3.0 * 10.0)
    assert(byNo("IN-1").getAs[String]("category_type") === "Bahan Baku")
    assert(byNo("IN-1").getAs[String]("supplier_name") === "supp \"x\"")
    assert(byNo("IN-1").getAs[String]("division_name") === "Garment Division")
    // M5: EUR has no live rate → 1
    assert(byNo("IN-2").getAs[Double]("deal_rate") === 1.0)
    assert(byNo("IN-2").getAs[String]("category_type") === "Jasa")
    // IN-3: no PR match → category fields null; qty 0 → total gated to null
    assert(byNo("IN-3").getAs[String]("category_type") === null)
    assert(byNo("IN-3").get(byNo("IN-3").fieldIndex("total_price")) === null)
    assert(byNo("IN-3").get(byNo("IN-3").fieldIndex("delivered_quantity")) === null)
  }
}
