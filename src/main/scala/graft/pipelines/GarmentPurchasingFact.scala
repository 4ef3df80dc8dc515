package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.business
import graft.ops.relational

/**
 * Garment purchasing fact — the hard-semantics pipeline
 * (`/root/reference/GarmentPembelian/run.js`, SURVEY §7 slice 4):
 *
 *  - as-of currency rate: latest rate at-or-before the DO date, default
 *    1 when absent (J8/M5, `GarmentTotalHutang/run.js:121-133`, `:213`);
 *  - last-fulfillment delivery date per item via a window max (J9,
 *    `GarmentPembelian/run.js:620`) feeding the on-time status with the
 *    garment variant's +7h WIB shift applied before comparing (C5,
 *    `:579-586`);
 *  - garment category typing (C4, `:567-577`) and month/week lead-time
 *    buckets (C1/C2, `:539-565`).
 */
object GarmentPurchasingFact extends Pipeline {
  val name = "garment-purchasing-fact"
  val sources = Seq("garmentPOItems", "fulfillments", "garmentCurrencies")
  val factKeys = Seq("po_item_id")
  // reference extracts >= the watermark (GarmentPembelian/run.js:91)
  override val watermarkInclusive = true

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val items = t("garmentPOItems")
    // J9: keep each item's LAST fulfillment by delivery date
    val lastFulfillment = relational.argmaxPerGroup(
      t("fulfillments"), Seq("poItemId"), col("deliveryOrderDate"),
      Seq(col("fulfillmentId").desc))
      .select(col("poItemId"), col("deliveryOrderDate"), col("doCurrencyCode"))

    val withDo = items.join(lastFulfillment,
      items("id") === lastFulfillment("poItemId"), "left")

    // J8: as-of rate at the delivery date, per currency code
    val rates = t("garmentCurrencies")
      .select(col("code").as("rateCode"), col("date").as("rateDate"),
        col("rate"))
    val withRate = relational.asOfJoin(withDo, rates,
      col("doCurrencyCode") === col("rateCode"),
      col("deliveryOrderDate"), col("rateDate"), items("id"),
      Seq(col("rate").desc))

    val leadDays = business.dayDiff(col("deliveryOrderDate"),
      col("shipmentDate"))
    withRate.select(
      items("id").as("po_item_id"),
      business.nullIfFalsyStr(col("poSerialNumber")).as("po_serial"),
      business.categoryTypeGarment(col("categoryCode")).as("category_type"),
      business.monthBucket(leadDays).as("delay_month_bucket"),
      business.weekBucket(leadDays).as("delay_week_bucket"),
      // C6 guard: the reference only computes the status when a DO date
      // exists (`item.doDate ? getStatus(...) : null`)
      when(col("deliveryOrderDate").isNotNull,
        business.onTimeStatus(business.wibTimestamp(col("deliveryOrderDate")),
          business.wibTimestamp(col("shipmentDate")))).as("ontime_status"),
      business.totalPrice(col("quantity"), col("pricePerUnit"),
        business.defaultRate(col("rate"))).as("total_price_idr"))
  }
}
