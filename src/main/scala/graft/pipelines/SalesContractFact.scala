package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.business

/**
 * Sales-contract fact — the U2 shape: three production branches
 * (Spinning / Weaving / Finishing Printing) each run the same transform
 * and land in ONE fact table with a literal `productionType`
 * discriminator (`/root/reference/SpinningSC/run.js:124`,
 * `WeavingSC/run.js:128`, `FinishingPrintingSC/run.js:130`).
 *
 * Per-branch transform mirrors the shared contract logic: construction
 * string (T3 — null if any part null, `FinishingPrintingSC/run.js:
 * 102-108`), yard→metre conversion (M2, `:92-100`), WIB date floor.
 */
object SalesContractFact extends Pipeline {
  val name = "sales-contract-fact"
  val sources = Seq("spinningContracts", "weavingContracts", "fpContracts")
  val factKeys = Seq("contract_no")

  private def branch(df: DataFrame, productionType: String): DataFrame =
    df.select(
      business.nullIfFalsyStr(col("contractNo")).as("contract_no"),
      lit(productionType).as("production_type"),
      business.nullIfFalsyStr(col("buyerName")).as("buyer_name"),
      to_date(business.wibTimestamp(col("createdUtc"))).as("contract_date"),
      business.constructionString(col("material"), col("construction"),
        col("yarn"), col("width")).as("construction_string"),
      business.orderQtyConversion(col("uom"), col("orderQuantity"))
        .as("order_qty_meters"),
      col("amount").as("amount"))

  def transform(t: Map[String, DataFrame]): DataFrame =
    branch(t("spinningContracts"), "Spinning")
      .unionByName(branch(t("weavingContracts"), "Weaving"))
      .unionByName(branch(t("fpContracts"), "Finishing Printing"))
}
