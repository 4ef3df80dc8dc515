package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (type 2) history builder.
 *
 * The reference's dimension sinks overwrite attributes in place on every
 * run (`Pembelian/run.js` upserts the latest row per key — type 1); the
 * warehouse-grade extension is the type-2 history every BI layer
 * eventually asks for: one validity interval per attribute change, with
 * `valid_from`/`valid_to`/`is_current` derived from the change log.
 *
 * Shape at 100 TB: both passes are windows over the same
 * `(key, order)` partitioning, so Catalyst plans ONE shuffle+sort and
 * reuses it — no self-join against the "previous version" table, which
 * is the naive SCD2 formulation and doubles the IO. The change log is
 * never collected; keys parallelize across reducers.
 */
object Scd {

  /**
   * Collapse a change log into SCD2 validity intervals.
   *
   *  1. change-compression: a log row that repeats the previous row's
   *     tracked attributes (per key, in `tsCol, tiebreak` order) is not
   *     a change and is dropped — null-safe struct compare, so
   *     null→null repeats compress too;
   *  2. interval derivation: `valid_from` = the change timestamp,
   *     `valid_to` = the NEXT change's timestamp (exclusive bound),
   *     open interval (`null`) for the current version, flagged
   *     `is_current` = 1.
   */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tiebreak: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    val order: Seq[Column] = (tsCol +: tiebreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val compressed = changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      // keep the first version and every genuine change; <=> makes the
      // compare null-safe so a null attribute repeating stays compressed
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .drop("__prev")
    compressed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
