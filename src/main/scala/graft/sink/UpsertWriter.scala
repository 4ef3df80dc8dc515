package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Key-based upsert ("MERGE") into a parquet-backed fact table — the
 * engine's version of the reference's staging-table + `exec DL_UPSERT_*`
 * stored-proc transaction (S8/S11, `/root/reference/Pembelian/run.js:
 * 299-379`). Semantics: rows whose natural key appears in the incoming
 * batch are replaced; everything else is carried over; the swap is
 * all-or-nothing.
 *
 * Plan shape: `target ANTI JOIN batch ON keys` ∪ `batch` — one shuffle
 * on the key (or none when the batch is broadcastable, the common
 * incremental case: nightly deltas are small relative to the fact).
 * On a production lake this is exactly `MERGE INTO` on Delta/Iceberg,
 * which also removes the rewrite of untouched files; the parquet
 * implementation keeps the same contract for this environment, staging
 * the merged result and promoting it atomically via rename.
 */
object UpsertWriter {

  /** @return total rows in the fact after the merge, observed during the
    *         write job itself (`Dataset.observe` — no extra scan). */
  def upsert(spark: SparkSession, batch: DataFrame, targetPath: String,
             keys: Seq[String]): Long = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val staging = new org.apache.hadoop.fs.Path(targetPath + "__staging")
    val backup = new org.apache.hadoop.fs.Path(targetPath + "__old")

    val merged =
      if (fs.exists(target)) {
        val current = spark.read.parquet(targetPath)
        current.join(broadcast(batch.select(keys.map(col): _*).distinct()),
            keys, "left_anti")
          .unionByName(batch)
      } else batch

    val obs = org.apache.spark.sql.Observation()
    merged.observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // promote: staging → live (rename is atomic per path on HDFS-like FS)
    if (fs.exists(target)) {
      fs.delete(backup, true)
      fs.rename(target, backup)
    }
    fs.rename(staging, target)
    fs.delete(backup, true)
    obs.get("rows").asInstanceOf[Long]
  }
}
