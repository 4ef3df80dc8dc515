package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.business
import graft.ops.relational

/**
 * Production-order-status fact pipeline — re-expression of the
 * reference's `ProductionOrderStatus` pipeline
 * (`/root/reference/ProductionOrderStatus/run.js`):
 *
 *  - five-deep correlated first-match chain (`run.js:101-239`, J6):
 *    sales contract → production order (`salesContractNo`, not
 *    deleted) → kanban (`productionOrderId`) → daily operation
 *    (`kanbanId`, `input is not null`, P5) → fabric QC (`kanbanCode`);
 *  - fabric grade tests fan out one row per test (`run.js:253-283`,
 *    J5/U3) with a per-QC 1-based test index (A5); a contract whose QC
 *    exists but has zero tests produces NO rows, while a contract with
 *    no QC at all produces ONE row with null QC fields — the exact
 *    branch structure of `transform` (`run.js:255` vs `:290`);
 *  - M2 unit conversion on every quantity (`run.js:241-249`), with the
 *    kanban quantity converted using the PRODUCTION ORDER's uom (the
 *    reference wires `kanban.productionOrder.uom.unit = data.uom.unit`,
 *    `run.js:151`);
 *  - C6 truthiness gating per column (`run.js:258-282`).
 */
object ProductionOrderStatusFact extends Pipeline {
  val name = "production-order-status-fact"
  val sources = Seq("fpSalesContracts", "productionOrders", "kanbans",
    "dailyOperations", "fabricQCs", "fabricGradeTests")
  val factKeys = Seq("sales_contract_no", "test_index")
  // reference extracts >= the watermark (ProductionOrderStatus/run.js:78)
  override val watermarkInclusive = true

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val sc = t("fpSalesContracts").withColumn("__sc_row",
      monotonically_increasing_id())

    val po = t("productionOrders").filter(!col("isDeleted"))
      .select(col("salesContractNo"), col("id").as("po_id"),
        col("createdUtc").as("po_created"), col("orderNo").as("po_no"),
        col("orderQuantity").as("po_qty"), col("uomUnit").as("po_uom"),
        col("deliveryDate").as("po_delivery"))
    val kanban = t("kanbans").filter(!col("isDeleted"))
      .select(col("productionOrderId").as("po_id"), col("id").as("k_id"),
        col("createdUtc").as("k_created"), col("code").as("k_code"),
        col("cartQty").as("k_cart_qty"),
        col("cartCartNumber").as("k_cart_number"),
        col("productionOrderSalesContractNo").as("k_sc_no"))
    val dop = t("dailyOperations")
      .filter(!col("isDeleted") && col("input").isNotNull) // P5
      .select(col("kanbanId").as("k_id"), col("createdUtc").as("dop_created"),
        col("code").as("dop_code"), col("input").as("dop_input"))
    val fqc = t("fabricQCs").filter(!col("isDeleted"))
      .select(col("kanbanCode").as("k_code"), col("id").as("fqc_id"),
        col("dateIm").as("fqc_date"), col("code").as("fqc_code"))
    val tests = t("fabricGradeTests")
      .select(col("fabricQualityControlId").as("fqc_id"),
        col("id").as("test_id"), col("initLength").as("test_init_length"))

    val chained = relational.keepFirstMatch(
      relational.keepFirstMatch(
        relational.keepFirstMatch(
          relational.keepFirstMatch(sc, po, Seq("salesContractNo"),
            Seq(col("po_id"))),
          kanban, Seq("po_id"), Seq(col("k_id"))),
        dop, Seq("k_id"), Seq(col("dop_created"), col("dop_code"))),
      fqc, Seq("k_code"), Seq(col("fqc_id")))

    // grade tests fan out; a QC with zero tests drops its contract row,
    // a missing QC keeps one row with null test fields (run.js:255,:290)
    val fanned = chained.join(tests, Seq("fqc_id"), "left")
      .filter(col("fqc_id").isNull || col("test_id").isNotNull)

    val wIdx = Window.partitionBy(col("__sc_row")).orderBy(col("test_id"))

    def conv(uom: org.apache.spark.sql.Column, qty: org.apache.spark.sql.Column) =
      business.orderQtyConversion(uom, qty)

    fanned.select(
      when(col("createdUtc").isNotNull,
        date_format(business.wibTimestamp(col("createdUtc")), "yyyy-MM-dd"))
        .as("sales_contract_date"),
      business.nullIfFalsyStr(col("salesContractNo")).as("sales_contract_no"),
      when(business.nullIfFalsyNum(col("orderQuantity")).isNotNull,
        conv(col("uomUnit"), col("orderQuantity"))).as("sales_contract_quantity"),
      when(col("po_created").isNotNull,
        date_format(business.wibTimestamp(col("po_created")), "yyyy-MM-dd"))
        .as("production_order_date"),
      business.nullIfFalsyStr(col("po_no")).as("production_order_no"),
      when(business.nullIfFalsyNum(col("po_qty")).isNotNull,
        conv(col("po_uom"), col("po_qty"))).as("production_order_quantity"),
      // run.js:270 — the PO's own contract number (= the join key when
      // the PO matched), truthiness-gated, null when the PO is absent
      when(col("po_no").isNotNull,
        business.nullIfFalsyStr(col("salesContractNo")))
        .as("production_sales_contract_no"),
      when(col("k_created").isNotNull,
        date_format(business.wibTimestamp(col("k_created")), "yyyy-MM-dd"))
        .as("kanban_date"),
      business.nullIfFalsyStr(col("k_code")).as("kanban_code"),
      business.nullIfFalsyStr(col("k_sc_no")).as("kanban_sales_contract_no"),
      // kanban qty converted with the PO's uom (run.js:151, :276)
      when(business.nullIfFalsyNum(col("k_cart_qty")).isNotNull &&
        business.nullIfFalsyStr(col("po_uom")).isNotNull,
        conv(col("po_uom"), col("k_cart_qty"))).as("kanban_quantity"),
      business.nullIfFalsyStr(col("k_cart_number")).as("cart_number"),
      when(col("dop_code").isNotNull, col("dop_input"))
        .as("daily_operation_quantity"),
      business.nullIfFalsyStr(col("dop_code")).as("daily_operation_code"),
      // run.js:278 — gated on DOP presence only, value is the KANBAN's
      // contract number rewired through joinDailyOperation (run.js:185)
      when(col("dop_code").isNotNull, col("k_sc_no"))
        .as("daily_operation_sales_contract_no"),
      when(col("dop_created").isNotNull,
        date_format(business.wibTimestamp(col("dop_created")), "yyyy-MM-dd"))
        .as("daily_operation_date"),
      when(col("fqc_date").isNotNull,
        date_format(business.wibTimestamp(col("fqc_date")), "yyyy-MM-dd"))
        .as("fabric_qc_date"),
      business.nullIfFalsyStr(col("fqc_code")).as("fabric_qc_code"),
      business.nullIfFalsyNum(col("test_init_length")).as("fabric_qc_quantity"),
      // A5: 1-based index per contract row, null when the QC is absent
      when(business.nullIfFalsyStr(col("fqc_code")).isNotNull,
        row_number().over(wIdx)).as("test_index"),
      when(col("deliverySchedule").isNotNull,
        date_format(business.wibTimestamp(col("deliverySchedule")),
          "yyyy-MM-dd")).as("sales_contract_delivery_date"),
      when(col("po_no").isNotNull,
        date_format(business.wibTimestamp(col("po_delivery")), "yyyy-MM-dd"))
        .as("production_order_delivery_date"),
      // run.js:284 — order type name, truthiness-gated
      business.nullIfFalsyStr(col("orderTypeName")).as("order_type"),
      col("isDeleted").cast("string").as("deleted"))
  }
}
