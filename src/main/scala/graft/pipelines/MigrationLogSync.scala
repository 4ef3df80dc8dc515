package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.relational

/**
 * Migration-log sync — the reference's one MongoDB pipeline
 * (`/root/reference/MigrationLogFunc/index.js:16-48`): latest
 * *successful* log record per pipeline description
 * (`$match status ∈ {Successful, success} → $sort finish desc →
 * $group $first`), appended to the warehouse control table.
 *
 * (The reference then calls the wrong stored proc —
 * `DL_UPSERT_FACT_PACKING`, `index.js:101`, a copy-paste bug documented
 * in SURVEY §5 — which this implementation deliberately does not
 * reproduce: the sync merges on `description`.)
 */
object MigrationLogSync extends Pipeline {
  val name = "migration-log-sync"
  val sources = Seq("externalLog")
  override val watermarkColumn = "finish"
  val factKeys = Seq("description")

  def transform(t: Map[String, DataFrame]): DataFrame =
    relational.argmaxPerGroup(
      t("externalLog").filter(col("status").isin("Successful", "success")),
      Seq("description"), col("finish"), Seq(col("start").desc))
      .select(col("description"), col("start"), col("finish"),
        col("executionTime"), col("status"))
}
