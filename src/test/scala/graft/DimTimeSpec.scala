package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.control.WatermarkManager
import graft.pipelines.{Pipeline, PipelineRunner}
import graft.sink.DimTime

/** S9 — dim-time sink: unseen dates are merged into the shared dim in
  * the same envelope as the fact, idempotently, insert-only in effect. */
class DimTimeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("derive: distinct non-null dates across several columns, with attributes") {
    import spark.implicits._
    val fact = Seq(
      (ts("2020-01-04 10:00:00"), ts("2020-01-05 00:00:00")),
      (ts("2020-01-04 23:59:59"), null.asInstanceOf[Timestamp]),
      (ts("2020-01-05 00:00:00"), ts("2020-01-04 00:00:00"))
    ).toDF("a", "b")
    val dim = DimTime.derive(fact, Seq("a", "b"))
      .orderBy("cal_date").collect()
    assert(dim.map(_.getDate(0).toString).toSeq === Seq("2020-01-04", "2020-01-05"))
    val sat = dim.head // 2020-01-04 is a Saturday
    assert(sat.getAs[Int]("y") === 2020)
    assert(sat.getAs[Int]("m") === 1)
    assert(sat.getAs[Int]("d") === 4)
    assert(sat.getAs[Int]("dow") === 6)
    assert(sat.getAs[String]("day_name") === "Saturday")
    assert(sat.getAs[Boolean]("is_weekend"))
    val sun = dim(1) // 2020-01-05 is a Sunday
    assert(sun.getAs[Int]("dow") === 7)
    assert(sun.getAs[Boolean]("is_weekend"))
  }

  private object DatedPipeline extends Pipeline {
    val name = "dated-fact"
    val sources = Seq("src")
    val factKeys = Seq("id")
    override val dateColumns = Seq("event_date")
    def transform(t: Map[String, DataFrame]): DataFrame =
      t("src").select(col("id"), to_date(col("lastmodifiedutc")).as("event_date"))
  }

  test("runner merges fact and dim-time together; reruns add only new dates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dimtime").toString
    val control = new WatermarkManager(spark, s"$dir/control")
    val runner = new PipelineRunner(spark, control, s"$dir/warehouse")

    def src(upTo: String): Map[String, DataFrame] = Map("src" ->
      Seq((1L, ts("2020-03-01 08:00:00")), (2L, ts("2020-03-01 12:00:00")),
          (3L, ts("2020-04-15 09:00:00")))
        .toDF("id", "lastmodifiedutc")
        .filter(col("lastmodifiedutc") <= ts(upTo)))

    runner.run(DatedPipeline, src("2020-03-31 00:00:00"),
      Some(ts("2020-03-31 00:00:00")))
    val dim1 = spark.read.parquet(s"$dir/warehouse/dim-time")
    assert(dim1.select("cal_date").as[java.sql.Date].collect()
      .map(_.toString).sorted.toSeq === Seq("2020-03-01"))

    // second nightly run: only the April row is incremental → one new date,
    // the March row untouched
    runner.run(DatedPipeline, src("2020-05-01 00:00:00"),
      Some(ts("2020-05-01 00:00:00")))
    val dim2 = spark.read.parquet(s"$dir/warehouse/dim-time")
    assert(dim2.select("cal_date").as[java.sql.Date].collect()
      .map(_.toString).sorted.toSeq === Seq("2020-03-01", "2020-04-15"))
    // idempotence: replaying the same window changes nothing
    runner.run(DatedPipeline, src("2020-05-01 00:00:00"),
      Some(ts("2020-05-01 00:00:00")))
    val dim3 = spark.read.parquet(s"$dir/warehouse/dim-time")
    assert(dim3.count() === 2)
    assert(spark.read.parquet(s"$dir/warehouse/dated-fact").count() === 3)
  }
}
