package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.control.WatermarkManager
import graft.pipelines._

/** Watermark boundary fidelity: the reference mixes strict (`>`) and
  * inclusive (`>=`) extraction across its 22 pipelines; each engine
  * pipeline must declare its reference's operator, and the runner must
  * honor it for rows timestamped exactly at the watermark. */
class WatermarkBoundarySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each pipeline declares its reference's boundary operator") {
    val inclusive = Set[Pipeline](DailyOperationFact, FabricQCFact,
      GarmentPurchasingFact, GarmentTotalHutangFact, KanbanFact,
      MonitoringEventFact, PackingFact, ProductionOrderFact,
      ProductionOrderStatusFact)
    val strict = Set[Pipeline](PurchasingFact, SalesContractFact,
      ShipmentFact, TotalHutangFact, PackingReceiptFact,
      InventoryMovementFact, InventorySummaryFact, DealTrackingDealFact,
      DealTrackingActivityFact, DealTrackingBoardFact, DealTrackingStageFact)
    inclusive.foreach(p => assert(p.watermarkInclusive, p.name))
    strict.foreach(p => assert(!p.watermarkInclusive, p.name))
  }

  private abstract class IdPipeline(val name: String) extends Pipeline {
    val sources = Seq("src")
    val factKeys = Seq("id")
    def transform(t: Map[String, DataFrame]): DataFrame = t("src")
  }

  test("runner re-reads the boundary instant only for inclusive pipelines") {
    import spark.implicits._
    val strictP = new IdPipeline("strict-fact") {}
    val inclP = new IdPipeline("incl-fact") { override val watermarkInclusive = true }

    val dir = Files.createTempDirectory("graft-wm").toString
    val control = new WatermarkManager(spark, s"$dir/control")
    val runner = new PipelineRunner(spark, control, s"$dir/warehouse")

    val w = ts("2020-06-01 00:00:00")
    // establish the watermark: an empty first run that starts at `w`
    val empty = Map("src" -> Seq.empty[(Long, Timestamp)]
      .toDF("id", "lastmodifiedutc"))
    runner.run(strictP, empty, Some(w))
    runner.run(inclP, empty, Some(w))

    // second run: one row exactly AT the watermark, one after it
    val src = Map("src" -> Seq(
      (1L, w), (2L, ts("2020-06-02 00:00:00"))).toDF("id", "lastmodifiedutc"))
    val later = ts("2020-07-01 00:00:00")
    assert(runner.run(strictP, src, Some(later)) === 1) // only the newer row
    assert(runner.run(inclP, src, Some(later)) === 2)   // boundary re-read
  }
}
