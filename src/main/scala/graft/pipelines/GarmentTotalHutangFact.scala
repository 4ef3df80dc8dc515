package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.business
import graft.ops.relational

/**
 * Garment accounts-payable fact pipeline — re-expression of the
 * reference's `GarmentTotalHutang` pipeline
 * (`/root/reference/GarmentTotalHutang/run.js`):
 *
 *  - driving source: intern notes flattened through their item/detail
 *    chain in source SQL (`run.js:50-59`, J2);
 *  - J8 as-of join: latest garment-currency rate at-or-before the DO
 *    date per currency code (`run.js:121-133`), M5 default rate 1 when
 *    the lookup misses (`run.js:213`);
 *  - purchase-request enrichment with category code and division
 *    (`run.js:135-141`, J4 keep-first trio). The reference's
 *    `purchaseRequests.find(x => x.rono == data.roNo)` compares against
 *    the Promise.all ARRAY, so it never matches (`run.js:134` — latent
 *    bug, SURVEY §5); the intended `item.roNo` semantics are
 *    implemented here;
 *  - C4 garment category typing gated on the category NAME being
 *    present but computed from the category CODE (`run.js:207` — the
 *    gate/argument mismatch is the reference's, kept deliberately);
 *  - M1 total = rate × qty × price, gated on all three truthy
 *    (`run.js:219`).
 */
object GarmentTotalHutangFact extends Pipeline {
  val name = "garment-total-hutang-fact"
  val sources = Seq("internNotes", "garmentCurrencies", "purchaseRequests",
    "garmentCategories", "units")
  val factKeys = Seq("intern_note_no", "ro_no")
  // reference extracts >= the watermark (GarmentTotalHutang/run.js:60)
  override val watermarkInclusive = true

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val notes = t("internNotes").withColumn("__row",
      monotonically_increasing_id())

    // P8: only live currencies participate in the as-of pick (run.js:100)
    val cur = t("garmentCurrencies").filter(!col("_IsDeleted"))
      .select(col("code").as("currencyCode"), col("date").as("cur_date"),
        col("rate").as("cur_rate"))

    val asOf = relational.asOfJoin(notes, cur,
      notes("currencyCode") === cur("currencyCode"),
      col("doDate"), col("cur_date"), col("__row"),
      tiebreak = Seq(col("cur_rate")))
      .drop(cur("currencyCode"))

    val pr = t("purchaseRequests").filter(!col("isDeleted"))
      .select(col("rono").as("roNo"), col("categoryId").as("pr_category_id"),
        col("categoryName").as("pr_category_name"),
        col("unitId").as("pr_unit_id"), col("unitName").as("pr_unit_name"))
    val cat = t("garmentCategories").select(col("id").as("pr_category_id"),
      col("code").as("cat_code"))
    val unit = t("units").select(col("id").as("pr_unit_id"),
      col("divisionName").as("u_division_name"))

    val enriched = relational.keepFirstMatch(
      relational.keepFirstMatch(
        relational.keepFirstMatch(asOf, pr, Seq("roNo"),
          Seq(col("pr_category_name"))),
        cat, Seq("pr_category_id"), Seq(col("cat_code"))),
      unit, Seq("pr_unit_id"), Seq(col("u_division_name")))

    // M5: missing as-of rate → 1 (run.js:213: `rate ? rate : 1`,
    // so a stored rate of 0 ALSO becomes 1 — JS truthiness)
    val kurs = coalesce(business.nullIfFalsyNum(col("cur_rate")), lit(1.0))
    val hasPrCategory =
      business.nullIfFalsyStr(col("pr_category_name")).isNotNull

    enriched.select(
      col("isDeleted").cast("string").as("deleted"),
      business.nullIfFalsyStr(col("inNo")).as("intern_note_no"),
      when(col("inDate").isNotNull,
        date_format(business.wibTimestamp(col("inDate")), "yyyy-MM-dd"))
        .as("date"),
      when(business.nullIfFalsyStr(col("supplierName")).isNotNull,
        business.quoteSwap(col("supplierName"))).as("supplier_name"),
      // gate on the NAME, compute from the CODE (run.js:207)
      when(hasPrCategory, business.categoryTypeGarment(col("cat_code")))
        .as("category_type"),
      business.nullIfFalsyNum(col("pricePerDealUnit")).as("invoice_price"),
      business.nullIfFalsyNum(col("quantity")).as("delivered_quantity"),
      kurs.as("deal_rate"),
      when(business.nullIfFalsyNum(col("quantity")).isNotNull &&
        business.nullIfFalsyNum(col("pricePerDealUnit")).isNotNull,
        kurs * col("quantity") * col("pricePerDealUnit")).as("total_price"),
      lit(null).cast("double").as("total_payment"),
      when(hasPrCategory, col("pr_category_name")).as("category_name"),
      business.nullIfFalsyStr(col("u_division_name")).as("division_name"),
      business.nullIfFalsyStr(col("pr_unit_name")).as("unit_name"),
      col("roNo").as("ro_no"))
  }
}
