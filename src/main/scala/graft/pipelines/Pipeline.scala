package graft.pipelines

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.control.WatermarkManager
import graft.ops.relational
import graft.sink.UpsertWriter

/**
 * One incremental fact pipeline — the canonical dataflow every reference
 * function follows (`/root/reference/Pembelian/run.js:10-13`):
 *
 *   timestamp → extract(watermark) → join/transform → load(merge) → log
 *
 * A pipeline is a *pure function over DataFrames*: sources are injected,
 * so golden tests run on in-memory fixtures with zero infrastructure,
 * and the runner wires watermarks and the merge sink around the lazy
 * DAG. Unlike the reference there is no per-row JS loop and no chunked
 * INSERT plumbing — the transform is one declarative plan, and
 * incremental extraction is a pushed-down predicate.
 */
trait Pipeline {
  /** Control-table identity (the `description` column). */
  def name: String

  /** Source-table names this pipeline reads. */
  def sources: Seq[String]

  /** Name of the change-tracking column used for incremental extraction
    * on the *driving* source (first element of [[sources]]). */
  def watermarkColumn: String = "lastmodifiedutc"

  /** Natural key of the produced fact (MERGE key). */
  def factKeys: Seq[String]

  /** The declarative transform: driving source (already watermark-
    * filtered) + full side sources → fact rows. */
  def transform(tables: Map[String, DataFrame]): DataFrame
}

/** Driver-side orchestration around a [[Pipeline]]'s DAG. */
class PipelineRunner(spark: SparkSession, control: WatermarkManager,
                     warehouseDir: String) {

  /** Run one pipeline incrementally: extract rows newer than the last
    * successful run's start, transform, merge into the fact, and log the
    * outcome (failures are logged and re-thrown; a failed run leaves the
    * watermark untouched).
    *
    * @param startAt logical run-start override (this run's future
    *                watermark); defaults to wall clock, exactly like the
    *                reference's `timestamp()` step. Tests inject it to
    *                replay deterministic nightly windows. */
  def run(p: Pipeline, loadTable: String => DataFrame,
          startAt: Option[Timestamp] = None): Long = {
    val start = startAt.getOrElse(new Timestamp(System.currentTimeMillis()))
    try {
      val wm = control.lastWatermark(p.name)
      val tables = p.sources.map(s => s -> loadTable(s)).toMap
      val driving = p.sources.head
      val incremental = tables.updated(driving,
        relational.incrementalScan(tables(driving), col(p.watermarkColumn),
          lit(wm)))
      val fact = p.transform(incremental)
      // the fact row count comes back from the merge's own write job
      // (Dataset.observe) — no post-hoc re-scan of the fact
      val n = UpsertWriter.upsert(spark, fact,
        s"$warehouseDir/${p.name}", p.factKeys)
      control.logRun(p.name, start,
        new Timestamp(System.currentTimeMillis()), "Successful")
      n
    } catch {
      case e: Exception =>
        control.logRun(p.name, start,
          new Timestamp(System.currentTimeMillis()),
          s"Failed: ${e.getMessage}")
        throw e
    }
  }
}
