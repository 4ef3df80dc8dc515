package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.business
import graft.ops.relational

/**
 * Garment purchasing fact — full re-expression of the reference's
 * `GarmentPembelian` pipeline (`/root/reference/GarmentPembelian/
 * run.js:600-840`), the Mongo-document twin of Pembelian, with BOTH of
 * its dataflow branches:
 *
 *  - **PO branch**: purchase request ⨝ purchase order ⨝ PO items (both
 *    inner — the reference maps `purchaseOrder.items` only when the PO
 *    exists) with a LEFT fan-out over each item's fulfillment array
 *    (`run.js:611` — an item with no fulfillments still emits one row);
 *  - **PR-only branch** (`run.js:758-838`): a purchase request with NO
 *    purchase order fans out over the PR's OWN items — PR columns, item
 *    category/product/quantity/uom, staff name from the PR's creator,
 *    every downstream column null.
 *
 * Dialect differences from Pembelian, all reproduced:
 *  - lead times diff WIB-SHIFTED repaired dates (`add(7,"h").startOf
 *    ("day")` BEFORE the diff, `run.js:613-620` — Pembelian diffs
 *    unshifted instants);
 *  - within a FULFILLMENT row, the fulfillment-family day counts
 *    (`deliveryOrderDays`, `unitReceiptNoteDays`,
 *    `unitPaymentOrderDays`, `purchaseOrderDays`) emit literal 0 when
 *    their gate date is absent (`: `0``, `run.js:659`); on a
 *    no-fulfillment row they are NULL (`run.js:726-760`) — the
 *    presence marker distinguishes the two;
 *  - a null day count inside a gated RANGE falls into the FIRST bucket
 *    (JS `null <= 7` is true, `run.js:77-87`);
 *  - on-time status compares the LAST fulfillment's delivery date
 *    (array tail = highest fulfillment id, J9 `run.js:621`) against
 *    the EPO promise, both WIB-shifted (`run.js:579-586`). The
 *    reference dereferences the EPO unguarded — a crash when it is
 *    missing (SURVEY §5 latent bugs); here the C5 comparison is
 *    null-safe and lands in the else-branch;
 *  - supplier/currency/paymentMethod use the `!== undefined` C6
 *    dialect gated on EPO presence (zero/empty survive);
 *  - `prNoAtDo` alone skips the quote swap (`run.js:672`), and
 *    `purchaseOrderExternalNo` is quote-swapped ONLY on fulfillment
 *    rows (`run.js:654` vs `:724`) — branch-inconsistent dialects kept
 *    branch-inconsistent;
 *  - invoice/payment prices and quantities emit as strings (T5).
 */
object GarmentPurchasingFact extends Pipeline {
  val name = "garment-purchasing-fact"
  val sources = Seq("garmentPurchaseRequests", "garmentPurchaseOrders",
    "garmentPOItems", "garmentFulfillments", "garmentPRItems")
  val factKeys = Seq("po_item_id")
  // reference extracts >= the watermark (GarmentPembelian/run.js:91)
  override val watermarkInclusive = true

  // deterministic stand-in for the reference's current-year repair
  private val RepairYear = lit(2017)
  private def vd(c: Column): Column = business.validDate(c, RepairYear)
  /** WIB-shifted, repaired calendar day — the garment diff operand. */
  private def wibDay(c: Column): Column =
    to_date(business.wibTimestamp(vd(c)))
  private def dateStr(c: Column): Column =
    date_format(business.wibTimestamp(vd(c)), "yyyy-MM-dd")
  private def gs(c: Column): Column = business.nullIfFalsyStr(c)
  private def gn(c: Column): Column = business.nullIfFalsyNum(c)
  private def q(c: Column): Column = business.quoteSwap(c)
  private def nullStr: Column = lit(null).cast("string")
  private def nullInt: Column = lit(null).cast("int")

  /** SQL-side `CreatedBy not in ('dev','unit-test')` — applied to the
    * PR extract (run.js:91) AND the PO lookup (run.js:327); NULL
    * creators fail the predicate under three-valued logic. A PR whose
    * PO was creator-filtered looks PO-less and takes the PR-item
    * branch, exactly as the reference's empty lookup result does. */
  private def creatorOk(df: DataFrame): DataFrame =
    df.filter(col("createdBy").isNotNull &&
      !col("createdBy").isin("dev", "unit-test"))

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val pr = creatorOk(t("garmentPurchaseRequests")).select(col("id").as("pr_id"),
      col("no").as("prNo"), col("createdDate").as("prCreatedDate"),
      col("createdBy").as("prCreatedBy"),
      col("expectedDeliveryDate").as("prExpectedDeliveryDate"),
      col("unitCode"), col("unitName"), col("divisionCode"),
      col("divisionName"), col("deleted").as("prDeleted"))
    val po = creatorOk(t("garmentPurchaseOrders")).select(col("prId").as("pr_id"),
      col("id").as("po_id"), col("no").as("poNo"),
      col("createdDate").as("poCreatedDate"),
      col("createdBy").as("poCreatedBy"), col("deleted").as("poDeleted"))
    val items = t("garmentPOItems").select(col("poId").as("po_id"),
      col("id").as("po_item_id"), col("categoryCode"), col("categoryName"),
      col("productCode"), col("productName"), col("epoNo"),
      col("epoCreatedDate"), col("epoExpectedDeliveryDate"),
      col("supplierCode"), col("supplierName"), col("currencyCode"),
      col("currencySymbol"), col("currencyRate"), col("paymentMethod"),
      col("defaultQuantity"), col("defaultUomUnit"),
      col("pricePerDealUnit"), col("dealQuantity"))
    val ff = t("garmentFulfillments").select(col("poItemId").as("po_item_id"),
      col("fulfillmentId"), col("deliveryOrderNo"), col("deliveryOrderDate"),
      col("unitReceiptNoteNo"), col("unitReceiptNoteDate"),
      col("interNoteNo"), col("interNoteDate"), col("interNotePrice"),
      col("interNoteQuantity"), col("interNoteDueDate"),
      col("unitReceiptNoteDeliveredQuantity"))

    // J9: each item's LAST fulfillment (array tail = highest id) feeds
    // the on-time status of EVERY row of that item
    val lastDo = relational.argmaxPerGroup(ff, Seq("po_item_id"),
        col("fulfillmentId"), Seq(col("fulfillmentId").desc))
      .select(col("po_item_id"), col("deliveryOrderDate").as("lastDoDate"))

    val chain = pr
      .join(po, Seq("pr_id"))        // `if (purchaseOrder)` — inner
      .join(items, Seq("po_id"))     // `purchaseOrder.items.map` — inner
      .join(ff, Seq("po_item_id"), "left") // empty array → one null row
      .join(lastDo, Seq("po_item_id"), "left")

    // EPO presence ≈ the flattened document's epo fields being non-null;
    // fulfillment presence distinguishes "no fulfillments" (nulls) from
    // "fulfillment with a missing date" (literal-0 day counts)
    val hasEpo = col("epoNo").isNotNull || col("epoCreatedDate").isNotNull
    val hasFf = col("fulfillmentId").isNotNull

    // lead times on WIB-shifted repaired days (run.js:613-620)
    def wdd(a: Column, b: Column): Column = datediff(wibDay(a), wibDay(b))
    val poIntDays = wdd(col("poCreatedDate"), col("prCreatedDate"))
    val prPoExtDays = wdd(col("epoCreatedDate"), col("prCreatedDate"))
    val poExtDays = wdd(col("epoCreatedDate"), col("poCreatedDate"))
    val doDays = wdd(col("deliveryOrderDate"), col("epoCreatedDate"))
    val urnDays = wdd(col("unitReceiptNoteDate"), col("deliveryOrderDate"))
    val upoDays = wdd(col("interNoteDate"), col("unitReceiptNoteDate"))
    val poDays = wdd(col("interNoteDate"), col("poCreatedDate"))
    // fulfillment-family: 0 when the gate date is absent ON a
    // fulfillment row, null on a no-fulfillment row
    def ffDays(gate: Column, v: Column): Column =
      when(hasFf && gate.isNull, lit(0)).when(hasFf, v)

    val poBranch = chain.select(
      col("po_item_id"),
      when(gs(col("prNo")).isNotNull, q(col("prNo"))).as("pr_no"),
      when(col("prCreatedDate").isNotNull, dateStr(col("prCreatedDate")))
        .as("pr_date"),
      when(col("prExpectedDeliveryDate").isNotNull,
        dateStr(col("prExpectedDeliveryDate")))
        .as("expected_pr_delivery_date"),
      when(gs(col("unitCode")).isNotNull, q(col("unitCode"))).as("unit_code"),
      when(gs(col("unitName")).isNotNull, q(col("unitName"))).as("unit_name"),
      when(gs(col("divisionCode")).isNotNull, q(col("divisionCode")))
        .as("division_code"),
      when(gs(col("divisionName")).isNotNull, q(col("divisionName")))
        .as("division_name"),
      when(gs(col("categoryCode")).isNotNull, q(col("categoryCode")))
        .as("category_code"),
      when(gs(col("categoryName")).isNotNull, q(col("categoryName")))
        .as("category_name"),
      // C4: garment category typing from the (quote-swapped) code
      when(gs(col("categoryCode")).isNotNull,
        business.categoryTypeGarment(q(col("categoryCode"))))
        .as("category_type"),
      when(gs(col("productCode")).isNotNull, q(col("productCode")))
        .as("product_code"),
      when(gs(col("productName")).isNotNull, q(col("productName")))
        .as("product_name"),
      // request family: null day counts stay null, range gated on value
      poIntDays.as("purchase_request_days"),
      when(poIntDays.isNotNull, business.weekBucket(poIntDays))
        .as("purchase_request_days_range"),
      when(hasEpo, prPoExtDays).as("pr_po_external_days"),
      when(hasEpo && col("epoCreatedDate").isNotNull,
        business.weekBucket(coalesce(prPoExtDays, lit(0))))
        .as("pr_po_external_days_range"),
      col("prDeleted").cast("string").as("deleted_pr"),
      when(gs(col("poNo")).isNotNull, q(col("poNo"))).as("po_no"),
      when(col("poCreatedDate").isNotNull, dateStr(col("poCreatedDate")))
        .as("po_date"),
      when(hasEpo, poExtDays).as("po_external_days"),
      when(hasEpo && col("epoCreatedDate").isNotNull,
        business.weekBucket(coalesce(poExtDays, lit(0))))
        .as("po_external_days_range"),
      when(gs(col("poCreatedBy")).isNotNull, q(col("poCreatedBy")))
        .as("purchasing_staff_name"),
      when(gs(col("prNo")).isNotNull, q(col("prNo"))).as("pr_no_at_po"),
      col("poDeleted").cast("string").as("deleted_po"),
      // quote-swapped ONLY on fulfillment rows (run.js:654 vs :724)
      when(hasEpo && gs(col("epoNo")).isNotNull,
        when(hasFf, q(col("epoNo"))).otherwise(col("epoNo")))
        .as("po_external_no"),
      when(hasEpo && col("epoCreatedDate").isNotNull,
        dateStr(col("epoCreatedDate"))).as("po_external_date"),
      ffDays(col("deliveryOrderDate"), doDays).as("delivery_order_days"),
      when(hasFf && col("deliveryOrderDate").isNotNull,
        business.monthBucket(coalesce(doDays, lit(0))))
        .as("delivery_order_days_range"),
      // `!== undefined` dialect behind the EPO-presence gate
      when(hasEpo, q(col("supplierCode"))).as("supplier_code"),
      when(hasEpo, q(col("supplierName"))).as("supplier_name"),
      when(hasEpo, q(col("currencyCode"))).as("currency_code"),
      when(hasEpo, q(col("currencySymbol"))).as("currency_symbol"),
      when(hasEpo, q(col("paymentMethod"))).as("payment_method"),
      when(hasEpo && gn(col("currencyRate")).isNotNull, col("currencyRate"))
        .as("currency_rate"),
      gn(col("defaultQuantity")).as("purchase_quantity"),
      when(gs(col("defaultUomUnit")).isNotNull, q(col("defaultUomUnit")))
        .as("uom"),
      when(hasEpo && gs(col("epoNo")).isNotNull, col("pricePerDealUnit"))
        .as("price_per_unit"),
      // gated on rate AND price AND quantity, all truthy (run.js:691)
      when(gn(col("currencyRate")).isNotNull &&
          gn(col("pricePerDealUnit")).isNotNull &&
          gn(col("dealQuantity")).isNotNull,
        col("dealQuantity") * col("pricePerDealUnit") * col("currencyRate"))
        .as("total_price"),
      when(hasEpo && col("epoExpectedDeliveryDate").isNotNull,
        dateStr(col("epoExpectedDeliveryDate"))).as("expected_delivery_date"),
      // branch-inconsistent dialect: swapped on fulfillment rows
      // (run.js:664) but NOT on PO-only rows (run.js:739)
      when(gs(col("prNo")).isNotNull,
        when(hasFf, q(col("prNo"))).otherwise(col("prNo")))
        .as("pr_no_at_po_ext"),
      when(hasFf && gs(col("deliveryOrderNo")).isNotNull,
        q(col("deliveryOrderNo"))).as("delivery_order_no"),
      when(hasFf && col("deliveryOrderDate").isNotNull,
        dateStr(col("deliveryOrderDate"))).as("delivery_order_date"),
      ffDays(col("unitReceiptNoteDate"), urnDays)
        .as("unit_receipt_note_days"),
      when(hasFf && col("unitReceiptNoteDate").isNotNull,
        business.weekBucket(coalesce(urnDays, lit(0))))
        .as("unit_receipt_note_days_range"),
      // C5 vs the LAST fulfillment's DO date, WIB-shifted both sides;
      // null-safe where the reference would crash on a missing EPO
      when(hasFf && col("deliveryOrderDate").isNotNull,
        business.onTimeStatus(
          business.wibTimestamp(col("lastDoDate")),
          business.wibTimestamp(col("epoExpectedDeliveryDate"))))
        .as("ontime_status"),
      // the ONE column the reference emits without a quote swap
      when(hasFf, gs(col("prNo"))).as("pr_no_at_do"),
      when(hasFf && gs(col("unitReceiptNoteNo")).isNotNull,
        q(col("unitReceiptNoteNo"))).as("unit_receipt_note_no"),
      when(hasFf && col("unitReceiptNoteDate").isNotNull,
        dateStr(col("unitReceiptNoteDate"))).as("unit_receipt_note_date"),
      ffDays(col("interNoteDate"), upoDays).as("unit_payment_order_days"),
      when(hasFf && col("interNoteDate").isNotNull,
        business.weekBucket(coalesce(upoDays, lit(0))))
        .as("unit_payment_order_days_range"),
      when(hasFf && gs(col("interNoteNo")).isNotNull, q(col("interNoteNo")))
        .as("unit_payment_order_no"),
      when(hasFf && col("interNoteDate").isNotNull,
        dateStr(col("interNoteDate"))).as("unit_payment_order_date"),
      ffDays(col("interNoteDate"), poDays).as("purchase_order_days"),
      when(hasFf && col("interNoteDate").isNotNull,
        business.monthBucket(coalesce(poDays, lit(0))))
        .as("purchase_order_days_range"),
      when(gn(col("interNotePrice")).isNotNull,
        col("interNotePrice").cast("string")).as("invoice_price"),
      when(gn(col("interNotePrice")).isNotNull,
        col("interNotePrice").cast("string")).as("unit_payment_order_price"),
      when(gn(col("interNoteQuantity")).isNotNull,
        col("interNoteQuantity").cast("string"))
        .as("unit_payment_order_quantity"),
      when(col("interNoteDueDate").isNotNull, dateStr(col("interNoteDueDate")))
        .as("unit_payment_order_due_date"),
      // `!= undefined`: zero delivered quantity survives (run.js:700)
      col("unitReceiptNoteDeliveredQuantity").cast("string")
        .as("unit_receipt_note_delivered_quantity"))

    // PR-only branch: requests with no purchase order fan out over the
    // PR's OWN items (run.js:758-838)
    val prItems = t("garmentPRItems").select(col("prId").as("pr_id"),
      col("id").as("po_item_id"), col("categoryCode"), col("categoryName"),
      col("productCode"), col("productName"), col("quantity"),
      col("uomUnit"))
    val prOnly = pr
      .join(po.select(col("pr_id")), Seq("pr_id"), "left_anti")
      .join(prItems, Seq("pr_id"))
      .select(
        col("po_item_id"),
        when(gs(col("prNo")).isNotNull, q(col("prNo"))).as("pr_no"),
        when(col("prCreatedDate").isNotNull, dateStr(col("prCreatedDate")))
          .as("pr_date"),
        when(col("prExpectedDeliveryDate").isNotNull,
          dateStr(col("prExpectedDeliveryDate")))
          .as("expected_pr_delivery_date"),
        when(gs(col("unitCode")).isNotNull, q(col("unitCode")))
          .as("unit_code"),
        when(gs(col("unitName")).isNotNull, q(col("unitName")))
          .as("unit_name"),
        when(gs(col("divisionCode")).isNotNull, q(col("divisionCode")))
          .as("division_code"),
        when(gs(col("divisionName")).isNotNull, q(col("divisionName")))
          .as("division_name"),
        when(gs(col("categoryCode")).isNotNull, q(col("categoryCode")))
          .as("category_code"),
        when(gs(col("categoryName")).isNotNull, q(col("categoryName")))
          .as("category_name"),
        when(gs(col("categoryCode")).isNotNull,
          business.categoryTypeGarment(q(col("categoryCode"))))
          .as("category_type"),
        when(gs(col("productCode")).isNotNull, q(col("productCode")))
          .as("product_code"),
        when(gs(col("productName")).isNotNull, q(col("productName")))
          .as("product_name"),
        nullInt.as("purchase_request_days"),
        nullStr.as("purchase_request_days_range"),
        nullInt.as("pr_po_external_days"),
        nullStr.as("pr_po_external_days_range"),
        col("prDeleted").cast("string").as("deleted_pr"),
        nullStr.as("po_no"),
        nullStr.as("po_date"),
        nullInt.as("po_external_days"),
        nullStr.as("po_external_days_range"),
        // staff name comes from the PR's creator here (run.js:793)
        when(gs(col("prCreatedBy")).isNotNull, q(col("prCreatedBy")))
          .as("purchasing_staff_name"),
        nullStr.as("pr_no_at_po"),
        nullStr.as("deleted_po"),
        nullStr.as("po_external_no"),
        nullStr.as("po_external_date"),
        nullInt.as("delivery_order_days"),
        nullStr.as("delivery_order_days_range"),
        nullStr.as("supplier_code"),
        nullStr.as("supplier_name"),
        nullStr.as("currency_code"),
        nullStr.as("currency_symbol"),
        nullStr.as("payment_method"),
        lit(null).cast("double").as("currency_rate"),
        gn(col("quantity")).as("purchase_quantity"),
        when(gs(col("uomUnit")).isNotNull, q(col("uomUnit"))).as("uom"),
        lit(null).cast("double").as("price_per_unit"),
        lit(null).cast("double").as("total_price"),
        nullStr.as("expected_delivery_date"),
        nullStr.as("pr_no_at_po_ext"),
        nullStr.as("delivery_order_no"),
        nullStr.as("delivery_order_date"),
        nullInt.as("unit_receipt_note_days"),
        nullStr.as("unit_receipt_note_days_range"),
        nullStr.as("ontime_status"),
        nullStr.as("pr_no_at_do"),
        nullStr.as("unit_receipt_note_no"),
        nullStr.as("unit_receipt_note_date"),
        nullInt.as("unit_payment_order_days"),
        nullStr.as("unit_payment_order_days_range"),
        nullStr.as("unit_payment_order_no"),
        nullStr.as("unit_payment_order_date"),
        nullInt.as("purchase_order_days"),
        nullStr.as("purchase_order_days_range"),
        nullStr.as("invoice_price"),
        nullStr.as("unit_payment_order_price"),
        nullStr.as("unit_payment_order_quantity"),
        nullStr.as("unit_payment_order_due_date"),
        nullStr.as("unit_receipt_note_delivered_quantity"))

    poBranch.unionByName(prOnly)
  }
}
