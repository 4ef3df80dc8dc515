package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.business
import graft.ops.relational

/**
 * Purchasing fact pipeline — the engine's re-expression of the
 * reference's flagship `Pembelian` pipeline
 * (`/root/reference/Pembelian/run.js`):
 *
 *  - incremental extract of purchase requests by `lastmodifiedutc`
 *    (`run.js:120-170` — handled by the runner);
 *  - left join to internal purchase orders (`run.js:165` document chain,
 *    here the first hop) and keep-first currency lookup
 *    (`run.js:191-195`, J4);
 *  - transform: lead-time day diffs (`run.js:206-214`, D2), month/week
 *    buckets (`run.js:65-87`, C1/C2), on-time status (`run.js:97-106`,
 *    C5), total price (`run.js:256`, M1), truthiness null-gating on the
 *    string codes (`run.js:216-279`, C6);
 *  - merge on the PR-number natural key (the `DL_UPSERT_FACT_PEMBELIAN`
 *    analog, `run.js:328`).
 */
object PurchasingFact extends Pipeline {
  val name = "purchasing-fact"
  val sources = Seq("purchaserequests", "internalpurchaseorders", "currencies")
  val factKeys = Seq("pr_no")
  // S9: Pembelian maintains DIMTIME from the fact's dates (run.js:331-333)
  override val dateColumns = Seq("pr_date")

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val pr = t("purchaserequests")
    val ipo = t("internalpurchaseorders")
      .select(col("prNo").as("no"), col("poNo"),
        col("createdUtc").as("poCreatedUtc"))
    val currency = t("currencies")
      .select(col("code").as("currencyCode"), col("rate"),
        col("description").as("currencyDescription"))

    val joined = relational.keepFirstMatch(
      pr.join(ipo, Seq("no"), "left"),
      currency, Seq("currencyCode"), Seq(col("rate").desc))

    val prToPoDays = business.dayDiff(col("poCreatedUtc"), col("createdUtc"))
    joined.select(
      business.nullIfFalsyStr(col("no")).as("pr_no"),
      business.nullIfFalsyStr(col("poNo")).as("po_no"),
      to_date(business.wibTimestamp(col("createdUtc"))).as("pr_date"),
      prToPoDays.as("pr_to_po_days"),
      business.monthBucket(prToPoDays).as("pr_to_po_bucket"),
      business.weekBucket(prToPoDays).as("pr_to_po_week_bucket"),
      business.onTimeStatus(col("poCreatedUtc"), col("expectedDeliveryDate"))
        .as("ontime_status"),
      business.categoryTypeTextile(col("categoryName")).as("category_type"),
      business.totalPrice(col("dealQuantity"), col("pricePerDealUnit"),
        business.defaultRate(col("rate"))).as("total_price"),
      col("isDeleted").cast("string").as("pr_deleted"))
  }
}
