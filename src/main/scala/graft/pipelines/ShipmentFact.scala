package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.business
import graft.ops.relational

/**
 * Shipment-document fact — the deepest nesting shape in the reference
 * (`/root/reference/ShipmentDocument/run.js:144-152`): shipment →
 * details → items → packingReceiptItems assembled app-side into a
 * 4-level document, then flattened into fact rows.
 *
 * Spark-first expression: the nested assembly is
 * [[relational.nestChildren]] (ArrayType(StructType) columns — useful
 * when the document itself is the product), and the fact is the flat
 * 4-way left-join + explode-preserving projection — one pass, no
 * row-at-a-time loops, parents without children survive with nulls
 * (the reference's left-outer-preserving `.filter(fk == id)` loops).
 */
object ShipmentFact extends Pipeline {
  val name = "shipment-fact"
  val sources = Seq("shipments", "shipmentDetails", "shipmentItems",
    "packingReceiptItems")
  val factKeys = Seq("shipment_code", "detail_id", "item_id", "pri_id")

  /** The nested document form (4 levels), for document-shaped sinks. */
  def assembleDocument(t: Map[String, DataFrame]): DataFrame = {
    val itemsWithPri = relational.nestChildren(
      t("shipmentItems"), t("packingReceiptItems"),
      Seq("itemId"), "packingReceiptItems")
    val detailsWithItems = relational.nestChildren(
      t("shipmentDetails"), itemsWithPri, Seq("detailId"), "items")
    relational.nestChildren(
      t("shipments"), detailsWithItems, Seq("shipmentCode"), "details")
  }

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val j = t("shipments")
      .join(t("shipmentDetails"), Seq("shipmentCode"), "left")
      .join(t("shipmentItems"), Seq("detailId"), "left")
      .join(t("packingReceiptItems"), Seq("itemId"), "left")
    j.select(
      business.nullIfFalsyStr(col("shipmentCode")).as("shipment_code"),
      to_date(business.wibTimestamp(col("deliveryDate"))).as("delivery_date"),
      col("detailId").as("detail_id"),
      business.nullIfFalsyStr(col("productName")).as("product_name"),
      col("itemId").as("item_id"),
      col("priId").as("pri_id"),
      col("quantity").as("quantity"),
      business.truncateTo(col("buyerName"), 49).as("buyer_name"))
  }
}
