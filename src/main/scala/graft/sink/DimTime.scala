package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S9 — dim-time maintenance: derive the distinct calendar dates a fact
 * batch touches and MERGE the unseen ones into a persistent, shared
 * date dimension. The engine's version of the reference's
 * `exec DL_INSERT_DIMTIME` step, which runs inside the SAME transaction
 * as the fact upsert (`/root/reference/Pembelian/run.js:328-337`) —
 * here the same atomicity comes from staging fact + dim through one
 * [[UpsertWriter.upsertAll]] envelope (see [[graft.pipelines.PipelineRunner]]).
 *
 * A dim-time row is a pure function of its date, so MERGE-by-key is
 * equivalent to the reference's insert-if-absent: existing dates are
 * "replaced" with identical content, new dates are added. Attribute set
 * matches the derived calendar query (q25): year / month / day /
 * ISO day-of-week, plus names and a weekend flag.
 *
 * Scale shape: per batch this is a column-pruned scan of the (already
 * persisted) fact batch, a distinct over a handful of dates, and a tiny
 * dim merge — no extra pass over any full table.
 */
object DimTime {

  /** Distinct calendar rows for every non-null date in `dateCols`. */
  def derive(fact: DataFrame, dateCols: Seq[String]): DataFrame = {
    require(dateCols.nonEmpty, "dim-time needs at least one date column")
    val dates = dateCols.map(c => fact.select(to_date(col(c)).as("cal_date")))
      .reduce(_.unionByName(_))
      .filter(col("cal_date").isNotNull)
      .distinct()
    dates.select(
      col("cal_date"),
      year(col("cal_date")).as("y"),
      month(col("cal_date")).as("m"),
      dayofmonth(col("cal_date")).as("d"),
      (weekday(col("cal_date")) + 1).as("dow"),
      date_format(col("cal_date"), "MMMM").as("month_name"),
      date_format(col("cal_date"), "EEEE").as("day_name"),
      (weekday(col("cal_date")) >= 5).as("is_weekend"))
  }
}
