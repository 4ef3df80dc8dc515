package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.pipelines.ShipmentFact

class ShipmentFactSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixtures: Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "shipments" -> Seq(
        ("SH-1", ts("2020-01-05 00:00:00"), "A long buyer name"),
        ("SH-2", ts("2020-01-06 00:00:00"), "Other buyer") // no details
      ).toDF("shipmentCode", "deliveryDate", "buyerName"),
      "shipmentDetails" -> Seq(
        (101L, "SH-1", "Cotton"), (102L, "SH-1", "Silk")
      ).toDF("detailId", "shipmentCode", "productName"),
      "shipmentItems" -> Seq(
        (1001L, 101L, 5.0), (1002L, 101L, 7.0) // only detail 101 has items
      ).toDF("itemId", "detailId", "quantity"),
      "packingReceiptItems" -> Seq(
        (9001L, 1001L), (9002L, 1001L), (9003L, 1002L)
      ).toDF("priId", "itemId"))
  }

  test("assembleDocument builds the 4-level ArrayType(StructType) document") {
    val doc = ShipmentFact.assembleDocument(fixtures)
    val detailsType = doc.schema("details").dataType
    assert(detailsType.isInstanceOf[ArrayType])
    val detailStruct = detailsType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val itemStruct = detailStruct("items").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(itemStruct.fieldNames.contains("packingReceiptItems"))
    // parents without children survive with empty arrays
    val sh2 = doc.filter(col("shipmentCode") === "SH-2").collect().head
    assert(sh2.getSeq[Any](sh2.fieldIndex("details")).isEmpty)
    // explode back out reproduces the flat cardinality
    val exploded = doc
      .select(col("shipmentCode"), explode_outer(col("details")).as("d"))
      .select(col("shipmentCode"), explode_outer(col("d.items")).as("i"))
      .select(col("shipmentCode"), explode_outer(col("i.packingReceiptItems")))
    assert(exploded.count() === 5) // 3 PRIs + silk item-less detail + SH-2
  }

  test("transform flattens left-preserving: every level survives absence below") {
    val fact = ShipmentFact.transform(fixtures)
    assert(fact.count() === 5) // 3 PRI rows + detail 102 (no items) + SH-2
    val sh2 = fact.filter(col("shipment_code") === "SH-2").collect().head
    assert(sh2.getAs[Any]("detail_id") === null)
    val silk = fact.filter(col("product_name") === "Silk").collect().head
    assert(silk.getAs[Any]("item_id") === null)
    // T2 truncate applied
    assert(fact.select(max(length(col("buyer_name")))).collect()
      .head.getInt(0) <= 49)
  }
}
