package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipelines._

/** Golden tests for the final ten reference pipelines: ProductionOrder,
  * Kanban, Packing, PackingReceipt, InventoryMovement,
  * InventorySummaries, and the DealTracking quartet — completing the
  * 22-pipeline inventory. */
class RemainingPipelinesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ProductionOrderFact: T3 construction string, M2, quote swap") {
    import spark.implicits._
    val pos = Seq(
      ("SC-1", "ORD-1", "print", "wash", "cot'ton", "2/1", "40s", "110",
        Option(200.0), "YDS", "buyer 'a'", "export",
        Option(ts("2020-05-01 00:00:00")), ts("2020-01-01 00:00:00"),
        "B-1", false, "user1", true),
      ("SC-2", "ORD-2", "print", "wash", "cotton", null, "40s", "110",
        Option.empty[Double], "MTR", "b", "local",
        Option.empty[Timestamp], ts("2020-01-02 00:00:00"), "B-2", false,
        "user2", false)
    ).toDF("salesContractNo", "orderNo", "orderTypeName",
      "processTypeName", "materialName", "materialConstructionName",
      "yarnMaterialName", "materialWidth", "orderQuantity", "uomUnit",
      "buyerName", "buyerType", "deliveryDate", "createdUtc", "buyerCode",
      "isDeleted", "accountUserName", "isClosed")
    val fact = ProductionOrderFact.transform(Map("productionOrders" -> pos))
    val byNo = fact.collect().map(r => r.getAs[String]("production_order_no") -> r).toMap

    val o1 = byNo("ORD-1")
    // T3 with quote-swapped parts
    assert(o1.getAs[String]("construction") === "cot\"ton 2/1 40s 110")
    // M2: 200 YDS → 182.88
    assert(math.abs(o1.getAs[Double]("total_order_conversion") - 182.88) < 1e-9)
    assert(o1.getAs[String]("buyer") === "buyer \"a\"")
    assert(o1.getAs[String]("is_closed") === "true")
    val o2 = byNo("ORD-2")
    // any null part → null construction
    assert(o2.getAs[String]("construction") === null)
    assert(o2.get(o2.fieldIndex("total_order_conversion")) === null)
  }

  test("KanbanFact: step fan-out and the != undefined zero-keeping dialect") {
    import spark.implicits._
    val kanbans = Seq(
      (1L, false, "K-1", ts("2020-01-01 00:00:00"), "ORD-1", "A", "C-1",
        Option(0.0), true, "SC-1", "wash", "print", false, false,
        Option.empty[Long])
    ).toDF("id", "isDeleted", "code", "createdUtc",
      "productionOrderOrderNo", "grade", "cartCartNumber", "cartQty",
      "isComplete", "productionOrderSalesContractNo",
      "productionOrderProcessTypeName", "productionOrderOrderTypeName",
      "isBadOutput", "isReprocess", "oldKanbanId")
    val instr = Seq((1L, 10L, "KI-1", "steps"))
      .toDF("kanbanId", "id", "code", "name")
    val steps = Seq(
      (10L, 100L, "ST-1", "wash", Option(ts("2020-02-01 00:00:00")),
        "area A", Option(50L), 1),
      (10L, 101L, "ST-2", "dry", Option.empty[Timestamp], "area B",
        Option.empty[Long], 2)
    ).toDF("instructionId", "id", "code", "process", "deadline",
      "processArea", "machineId", "stepIndex")
    val machines = Seq((50L, "M-1", "washer", Option(0.0)))
      .toDF("id", "code", "name", "monthlyCapacity")

    val fact = KanbanFact.transform(Map("kanbans" -> kanbans,
      "kanbanInstructions" -> instr, "kanbanSteps" -> steps,
      "machines" -> machines))
    val rows = fact.orderBy(col("step_index")).collect()
    assert(rows.length === 2) // one row per step
    // != undefined dialect: zero cart qty and zero capacity SURVIVE
    assert(rows.head.getAs[Double]("cart_qty") === 0.0)
    assert(rows.head.getAs[Double]("machine_monthly_capacity") === 0.0)
    assert(rows.head.getAs[String]("machine_code") === "M-1")
    // step without machine → nulls but row kept
    assert(rows(1).getAs[String]("machine_code") === null)
    assert(rows(1).getAs[String]("deadline") === null)
    assert(rows.forall(_.getAs[String]("kanban_id") === "1"))
  }

  test("PackingFact: detail fan-out, M4 zero defaults") {
    import spark.implicits._
    val packings = Seq(
      (1L, false, "alice", ts("2020-01-01 00:00:00"), "P-1", Option(7L),
        "ORD-1", "print", "SC-1", "d'c", "dn", "buy'er", "ex",
        Option(ts("2020-01-05 00:00:00")), "MTR", "red", "disperse",
        "2/1", "flow'er", "st'atus", true, false)
    ).toDF("id", "isDeleted", "createdBy", "createdUtc", "code",
      "productionOrderId", "productionOrderNo", "orderType",
      "salesContractNo", "designCode", "designNumber", "buyerName",
      "buyerType", "date", "packingUom", "colorName", "colorType",
      "construction", "motif", "status", "accepted", "declined")
      .withColumn("buyerId", lit(3L))
      .withColumn("buyerCode", lit("B-1"))
      .withColumn("buyerAddress", lit("jl. ba'tik"))
      .withColumn("colorCode", lit("C'1"))
      .withColumn("materialConstructionFinishId", lit(0L))
      .withColumn("materialConstructionFinishName", lit("fin'ish"))
      .withColumn("materialId", lit(9L))
      .withColumn("material", lit("cot'ton"))
      .withColumn("materialWidthFinish", lit("1.5m"))
      .withColumn("deliveryType", lit("de'liv"))
      .withColumn("finishedProductType", lit("fp'type"))
    val details = Seq(
      (1L, "LOT'1", "A", Option(12.5), Option.empty[Double], Option(0.0),
        Option("rem'ark"))
    ).toDF("packingId", "lot", "grade", "weight", "length", "quantity",
      "remark")
    val fact = PackingFact.transform(Map("packings" -> packings,
      "packingDetails" -> details))
    val r = fact.collect().head
    assert(r.getAs[String]("lot") === "LOT\"1")
    assert(r.getAs[Double]("weight") === 12.5)
    assert(r.getAs[Double]("length") === 0.0)   // null → 0
    assert(r.getAs[Double]("quantity") === 0.0) // 0 stays 0 (M4)
    assert(r.getAs[String]("status") === "st\"atus")
    assert(r.getAs[String]("accepted") === "true")
  }

  test("PackingReceiptFact: inner item join, T5 quoted numerics") {
    import spark.implicits._
    val receipts = Seq(
      (1L, false, "PR-1", Option(ts("2020-01-01 00:00:00")), "P-1", true,
        false, "RN-1", "rt", "ty'pe", "ORD-1", "buy'er", "red", "2/1",
        "MTR", "print", "disperse", "DC-1", "dn'1"),
      (2L, false, "PR-2", Option.empty[Timestamp], "P-2", false, false,
        "RN-2", "rt", "t", "ORD-2", "b", "blue", "3/1", "MTR", "print",
        "reactive", "DC-2", "dn2") // no items → dropped
    ).toDF("id", "isDeleted", "code", "date", "packingCode", "accepted",
      "declined", "referenceNo", "referenceType", "type",
      "productionOrderNo", "buyer", "colorName", "construction",
      "packingUom", "orderType", "colorType", "designCode", "designNumber")
    val items = Seq(
      (1L, "prod'uct", Option(5.0), Option(0.0), Option.empty[Double])
    ).toDF("packingReceiptId", "product", "quantity", "length", "weight")
    val fact = PackingReceiptFact.transform(Map(
      "packingReceipts" -> receipts, "packingReceiptItems" -> items))
    val rows = fact.collect()
    assert(rows.length === 1) // PR-2 dropped (no items)
    val r = rows.head
    assert(r.getAs[String]("code") === "PR-1")
    assert(r.getAs[String]("product") === "prod\"uct")
    // T5+C6: quantity string, zero length → null, null weight → null
    assert(r.getAs[String]("quantity") === "5.0")
    assert(r.getAs[String]("length") === null)
    assert(r.getAs[String]("weight") === null)
  }

  test("Inventory facts: scalar transforms, ungated measures") {
    import spark.implicits._
    val movements = Seq(
      ("ST-1", "Gudang 'A'", ts("2020-01-01 00:00:00"), -5.0, "OUT",
        "P-1", "kain 'x'", "MTR", false, "RN-1", "rt", 10.0, 5.0,
        Option.empty[String], "MV-1")
    ).toDF("storageCode", "storageName", "date", "quantity", "type",
      "productCode", "productName", "uom", "_deleted", "referenceNo",
      "referenceType", "before", "after", "remark", "code")
    val mv = InventoryMovementFact.transform(
      Map("inventoryMovements" -> movements)).collect().head
    assert(mv.getAs[String]("storage_name") === "Gudang \"A\"")
    assert(mv.getAs[Double]("quantity") === -5.0) // ungated measure
    assert(mv.getAs[Double]("before") === 10.0)
    assert(mv.getAs[String]("remark") === null)

    val summaries = Seq(
      ("ST-1", "Gudang 'A'", 42.0, "P-1", "kain", "MTR", false, "SM-1")
    ).toDF("storageCode", "storageName", "quantity", "productCode",
      "productName", "uom", "_deleted", "code")
    val sm = InventorySummaryFact.transform(
      Map("inventorySummaries" -> summaries)).collect().head
    assert(sm.getAs[Double]("quantity") === 42.0)
    assert(sm.getAs[String]("deleted") === "false")
  }

  test("DealTracking quartet: lookups, != undefined, dual stage output") {
    import spark.implicits._
    val deals = Seq(
      (1L, false, "D-1", ts("2020-01-01 00:00:00"), "carol", "big 'deal'",
        1500.5, Option(30L), "CO-1", "Acme 'Co'", "CT-1", "Dana",
        Option(ts("2020-04-01 00:00:00")), "de'sc", null.asInstanceOf[String],
        Option(0.0), "PCS")
    ).toDF("id", "isDeleted", "code", "createdUtc", "createdBy", "name",
      "amount", "companyId", "companyCode", "companyName", "contactCode",
      "contactName", "closeDate", "description", "reason", "quantity",
      "uomUnit")
    val companies = Seq((30L, "Solo 'City'")).toDF("id", "city")
    val deal = DealTrackingDealFact.transform(Map("deals" -> deals,
      "companies" -> companies)).collect().head
    assert(deal.getAs[String]("company_city") === "Solo \"City\"")
    assert(deal.getAs[String]("amount") === "1500.5")
    assert(deal.getAs[String]("quantity") === "0.0") // != undefined keeps 0
    assert(deal.getAs[String]("contact_name") === "Dana")
    assert(deal.getAs[String]("reason") === null)

    val activities = Seq(
      (2L, false, "A-1", ts("2020-01-02 10:30:00"), "eve", Option(1L),
        "task", "no'tes", "call 'em", Option(ts("2020-02-01 00:00:00")),
        Option("open"), Option(5L), Option(6L), "frank")
    ).toDF("id", "isDeleted", "code", "createdUtc", "createdBy", "dealId",
      "type", "notes", "taskTitle", "dueDate", "status", "sourceStageId",
      "targetStageId", "assignedTo")
    val act = DealTrackingActivityFact.transform(
      Map("activities" -> activities)).collect().head
    // full timestamp WIB (+7): 10:30 UTC → 17:30
    assert(act.getAs[String]("created_date") === "2020-01-02 17:30:00")
    assert(act.getAs[String]("title") === "call \"em")
    assert(act.getAs[String]("source_stage_id") === "5")

    val boards = Seq(
      (3L, false, "B-1", ts("2020-01-03 00:00:00"), "gil", "Q1 'board'",
        "USD", "$")
    ).toDF("id", "isDeleted", "code", "createdUtc", "createdBy", "title",
      "currencyCode", "currencySymbol")
    val currencies = Seq(("USD", 14000.0), ("USD", 13000.0))
      .toDF("code", "rate")
    val board = DealTrackingBoardFact.transform(Map("boards" -> boards,
      "currencies" -> currencies)).collect().head
    assert(board.getAs[String]("currency_rate") === "14000.0") // keep-first
    assert(board.getAs[String]("title") === "Q1 \"board\"")

    val stages = Seq(
      (4L, false, "S-1", ts("2020-01-04 00:00:00"), "hana", 3L, "Wo'n")
    ).toDF("id", "isDeleted", "code", "createdUtc", "createdBy",
      "boardId", "name")
    val stageDeals = Seq((4L, 1L)).toDF("stageId", "id")
    val fixtures = Map("stages" -> stages, "stageDeals" -> stageDeals)
    val stage = DealTrackingStageFact.transform(fixtures).collect().head
    assert(stage.getAs[String]("name") === "Wo\"n")
    assert(stage.getAs[String]("board_id") === "3")
    val map = DealTrackingStageFact.transformDeals(fixtures).collect().head
    assert(map.getAs[String]("stage_id") === "4")
    assert(map.getAs[String]("deal_id") === "1")
  }
}
