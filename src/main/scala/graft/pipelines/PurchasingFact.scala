package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.business

/**
 * Purchasing fact pipeline — full re-expression of the reference's
 * flagship `Pembelian` pipeline (`/root/reference/Pembelian/run.js`),
 * the 10-table procurement document chain pushed into one extract
 * query (`run.js:120-170`):
 *
 *   purchaserequests ⟕ internalPOs ⟕ epoItems ⟕ epoDetails ⟕
 *   externalPOs ⟕ doItems ⟕ deliveryOrders ⟕ unitReceiptNotes ⟕
 *   upoItems ⟕ unitPaymentOrders
 *
 * The reference's WHERE applies `ipo.IsDeleted = 0`, `ei.IsDeleted = 0`
 * and `ipo.createdby NOT IN (...)` to LEFT-joined tables — under SQL
 * three-valued logic NULL fails all three, so the first two hops are
 * effectively INNER joins (`run.js:166-168`): a purchase request
 * without an internal PO, or an internal PO without an EPO item, never
 * reaches the fact.
 *
 * Scalar layer (`run.js:201-283`): every emitted date passes the D6
 * min-date repair (`validateDate` — the reference repairs to the
 * CURRENT year, nondeterministic; the engine uses a fixed repair year)
 * and lands as a WIB-shifted `yyyy-MM-dd` string; seven lead times are
 * day-diffed on the repaired but UNSHIFTED instants (D2), bucketed by
 * week or month (C1/C2); on-time status compares the RAW dates (C5 —
 * `getStatus` applies no repair, `run.js:97-106`); C6 truthiness gates
 * per column; T1 quote-swap on product and supplier names only.
 *
 * Currency (`run.js:183-199`): `currencies.find(x => x.id ==
 * currencyId)` contributes ONLY the description — the rate rides the
 * EPO row. JS `a * null = 0`, so a missing EPO rate ZEROES the total
 * price rather than nulling it (`run.js:256`) — reproduced via
 * coalesce.
 */
object PurchasingFact extends Pipeline {
  val name = "purchasing-fact"
  val sources = Seq("purchaserequests", "internalpurchaseorders",
    "epoItems", "epoDetails", "externalPurchaseOrders", "doItems",
    "deliveryOrders", "unitReceiptNotes", "upoItems",
    "unitPaymentOrders", "currencies")
  val factKeys = Seq("pr_no")
  // S9: Pembelian maintains DIMTIME from the fact's dates (run.js:331-333)
  override val dateColumns = Seq("pr_date")

  // deterministic stand-in for the reference's `new Date().getFullYear()`
  private val RepairYear = lit(2017)
  private def vd(c: Column): Column = business.validDate(c, RepairYear)
  private def dateStr(c: Column): Column =
    date_format(business.wibTimestamp(vd(c)), "yyyy-MM-dd")
  private def gs(c: Column): Column = business.nullIfFalsyStr(c)
  private def gn(c: Column): Column = business.nullIfFalsyNum(c)

  def transform(t: Map[String, DataFrame]): DataFrame = {
    // run.js:167 also filters pr.createdby NOT IN ('dev','unit-test');
    // SQL NOT IN drops NULL createdby rows too.
    val pr = t("purchaserequests")
      .filter(col("createdBy").isNotNull &&
        !col("createdBy").isin("dev", "unit-test"))
      .select(
      col("id").as("pr_id"), col("no").as("prNo"),
      col("createdUtc").as("prCreatedUtc"),
      col("expectedDeliveryDate").as("prExpectedDeliveryDate"),
      col("budgetCode"), col("budgetName"), col("unitCode"),
      col("unitName"), col("divisionCode"), col("divisionName"),
      col("categoryCode"), col("categoryName"),
      col("isDeleted").as("prDeleted"))
    val ipo = t("internalpurchaseorders")
      .filter(!col("isDeleted") && col("createdBy").isNotNull &&
        !col("createdBy").isin("dev", "unit-test"))
      .select(col("prId").as("pr_id"), col("id").as("ipo_id"),
        col("poNo").as("PONo"), col("createdBy").as("ipoCreatedBy"),
        col("createdUtc").as("ipoCreatedUtc"),
        col("isDeleted").as("ipoIsDeleted"), col("prNo").as("ipoPrNo"),
        col("expectedDeliveryDate").as("ipoExpectedDeliveryDate"))
    val ei = t("epoItems").filter(!col("isDeleted"))
      .select(col("poId").as("ipo_id"), col("id").as("ei_id"),
        col("epoId").as("epo_id"))
    val ed = t("epoDetails").select(col("epoItemId").as("ei_id"),
      col("productCode"), col("productName"), col("dealQuantity"),
      col("dealUomUnit"), col("pricePerDealUnit"))
    val epo = t("externalPurchaseOrders").select(col("id").as("epo_id"),
      col("createdUtc").as("epoCreatedUtc"), col("epoNo"),
      col("supplierCode"), col("supplierName"), col("currencyId"),
      col("currencyCode"), col("paymentMethod"), col("currencyRate"))
    val doi = t("doItems").select(col("epoId").as("epo_id"),
      col("doId").as("do_id"))
    val dos = t("deliveryOrders").select(col("id").as("do_id"),
      col("doNo").as("DONo"), col("doDate").as("DODate"))
    val urn = t("unitReceiptNotes").select(col("doId").as("do_id"),
      col("id").as("urn_id"), col("urnNo").as("URNNo"),
      col("receiptDate"))
    val upoi = t("upoItems").select(col("urnId").as("urn_id"),
      col("upoId").as("upo_id"))
    val upo = t("unitPaymentOrders").select(col("id").as("upo_id"),
      col("upoNo").as("interNoteNo"), col("date").as("interNoteDate"))
    val currency = t("currencies").select(col("id").as("currencyId"),
      col("description").as("currencyDescription"))

    val chain = pr
      .join(ipo, Seq("pr_id"))  // inner-ized by the reference's WHERE
      .join(ei, Seq("ipo_id"))  // inner-ized by the reference's WHERE
      .join(ed, Seq("ei_id"), "left")
      .join(epo, Seq("epo_id"), "left")
      .join(doi, Seq("epo_id"), "left")
      .join(dos, Seq("do_id"), "left")
      .join(urn, Seq("do_id"), "left")
      .join(upoi, Seq("urn_id"), "left")
      .join(upo, Seq("upo_id"), "left")
      .join(currency, Seq("currencyId"), "left")

    // the seven lead times (run.js:206-214), diffed on repaired dates
    val prPoExtDays =
      business.dayDiff(vd(col("epoCreatedUtc")), vd(col("prCreatedUtc")))
    val poIntDays =
      business.dayDiff(vd(col("ipoCreatedUtc")), vd(col("prCreatedUtc")))
    val poExtDays =
      business.dayDiff(vd(col("epoCreatedUtc")), vd(col("ipoCreatedUtc")))
    val doDays =
      business.dayDiff(vd(col("DODate")), vd(col("epoCreatedUtc")))
    val urnDays =
      business.dayDiff(vd(col("receiptDate")), vd(col("DODate")))
    val upoDays =
      business.dayDiff(vd(col("interNoteDate")), vd(col("receiptDate")))
    val poDays =
      business.dayDiff(vd(col("interNoteDate")), vd(col("ipoCreatedUtc")))

    val hasIpoDate = col("ipoCreatedUtc").isNotNull
    val hasEpoDate = col("epoCreatedUtc").isNotNull

    chain.select(
      gs(col("prNo")).as("pr_no"),
      when(col("prCreatedUtc").isNotNull, dateStr(col("prCreatedUtc")))
        .as("pr_date"),
      when(col("prExpectedDeliveryDate").isNotNull,
        dateStr(col("prExpectedDeliveryDate")))
        .as("expected_pr_delivery_date"),
      gs(col("budgetCode")).as("budget_code"),
      gs(col("budgetName")).as("budget_name"),
      gs(col("unitCode")).as("unit_code"),
      gs(col("unitName")).as("unit_name"),
      gs(col("divisionCode")).as("division_code"),
      gs(col("divisionName")).as("division_name"),
      gs(col("categoryCode")).as("category_code"),
      gs(col("categoryName")).as("category_name"),
      when(gs(col("categoryName")).isNotNull,
        business.categoryTypeTextile(col("categoryName")))
        .as("category_type"),
      gs(col("productCode")).as("product_code"),
      when(gs(col("productName")).isNotNull,
        business.quoteSwap(col("productName"))).as("product_name"),
      when(hasIpoDate, poIntDays).as("purchase_request_days"),
      when(hasIpoDate, business.weekBucket(poIntDays))
        .as("purchase_request_days_range"),
      when(hasEpoDate, prPoExtDays).as("pr_po_external_days"),
      when(hasEpoDate, business.weekBucket(prPoExtDays))
        .as("pr_po_external_days_range"),
      gs(col("PONo")).as("po_no"),
      when(hasIpoDate, dateStr(col("ipoCreatedUtc"))).as("po_date"),
      when(hasEpoDate, poExtDays).as("po_external_days"),
      when(hasEpoDate, business.weekBucket(poExtDays))
        .as("po_external_days_range"),
      when(hasIpoDate, col("ipoCreatedBy")).as("purchasing_staff_name"),
      gs(col("ipoPrNo")).as("pr_no_at_po"),
      gs(col("epoNo")).as("po_external_no"),
      when(hasEpoDate, dateStr(col("epoCreatedUtc"))).as("po_external_date"),
      when(hasEpoDate && col("DODate").isNotNull, doDays)
        .as("delivery_order_days"),
      when(hasEpoDate && col("DODate").isNotNull,
        business.monthBucket(doDays)).as("delivery_order_days_range"),
      gs(col("supplierCode")).as("supplier_code"),
      when(gs(col("supplierName")).isNotNull,
        business.quoteSwap(col("supplierName"))).as("supplier_name"),
      gs(col("currencyCode")).as("currency_code"),
      gs(col("currencyDescription")).as("currency_name"),
      gs(col("paymentMethod")).as("payment_method"),
      gn(col("currencyRate")).as("currency_rate"),
      gn(col("dealQuantity")).as("purchase_quantity"),
      gs(col("dealUomUnit")).as("uom"),
      gn(col("pricePerDealUnit")).as("price_per_unit"),
      // JS `a * null = 0`: a missing EPO rate zeroes the total (run.js:256)
      when(gn(col("pricePerDealUnit")).isNotNull &&
          gn(col("dealQuantity")).isNotNull,
        col("dealQuantity") * col("pricePerDealUnit") *
          coalesce(col("currencyRate"), lit(0.0))).as("total_price"),
      when(col("ipoExpectedDeliveryDate").isNotNull,
        dateStr(col("ipoExpectedDeliveryDate"))).as("expected_delivery_date"),
      when(gs(col("epoNo")).isNotNull, col("prNo")).as("pr_no_at_po_ext"),
      gs(col("DONo")).as("delivery_order_no"),
      when(col("DODate").isNotNull, dateStr(col("DODate")))
        .as("delivery_order_date"),
      when(col("receiptDate").isNotNull, urnDays)
        .as("unit_receipt_note_days"),
      when(col("receiptDate").isNotNull, business.weekBucket(urnDays))
        .as("unit_receipt_note_days_range"),
      // C5 on RAW dates: delivered on/before the internal PO's promise
      when(col("DODate").isNotNull, business.onTimeStatus(col("DODate"),
        col("ipoExpectedDeliveryDate"))).as("ontime_status"),
      when(gs(col("DONo")).isNotNull, col("prNo")).as("pr_no_at_do"),
      gs(col("URNNo")).as("unit_receipt_note_no"),
      when(col("receiptDate").isNotNull, dateStr(col("receiptDate")))
        .as("unit_receipt_note_date"),
      when(col("interNoteDate").isNotNull, upoDays)
        .as("unit_payment_order_days"),
      when(col("interNoteDate").isNotNull, business.weekBucket(upoDays))
        .as("unit_payment_order_days_range"),
      gs(col("interNoteNo")).as("unit_payment_order_no"),
      when(col("interNoteDate").isNotNull, dateStr(col("interNoteDate")))
        .as("unit_payment_order_date"),
      when(col("interNoteDate").isNotNull, poDays).as("purchase_order_days"),
      when(col("interNoteDate").isNotNull, business.monthBucket(poDays))
        .as("purchase_order_days_range"),
      // T5: `'${pricePerDealUnit}'` — emitted as a string when invoiced
      when(col("interNoteDate").isNotNull,
        col("pricePerDealUnit").cast("string")).as("invoice_price"),
      col("prDeleted").cast("string").as("deleted_pr"),
      col("ipoIsDeleted").cast("string").as("deleted_po"))
  }
}
