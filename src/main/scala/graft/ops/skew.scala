package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation join utilities for the 100 TB path.
 *
 * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most
 * skew at runtime; explicit salting remains necessary when one side has
 * a pathological hot key AND the other side is too large to broadcast —
 * AQE can split a skewed *partition*, but every split still reads the
 * full matching build side. Salting shards the hot keys' rows across
 * `salts` sub-keys and replicates only the (bounded) other side.
 */
object skew {

  /**
   * Salted inner equi-join on `key`: `left` (skewed) gets a random-ish
   * but deterministic salt per row; `right` is replicated `salts` ways.
   * Correct for 1:N joins where `right` is unique per key (dims).
   *
   * Salt derivation is `pmod(hash(monotonically varying cols), salts)` —
   * deterministic given the row, so retries/speculative tasks agree.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot keys of `df.key` by frequency: keys whose row count exceeds
    * `threshold`. Used to split a join into salted-hot + plain-rest. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold)
      .select(col(key))

  /**
   * Two-path skew join: rows with hot keys go through the salted join,
   * the long tail through a plain join; results unioned. This is the
   * manual form of AQE's skew handling, usable when AQE can't see the
   * skew (e.g. skew introduced mid-stage by an explode).
   */
  def skewAwareJoin(left: DataFrame, right: DataFrame, key: String,
                    hotThreshold: Long, salts: Int,
                    saltBy: Column): DataFrame = {
    val hot = broadcast(hotKeys(left, key, hotThreshold))
    val leftHot = left.join(hot, Seq(key), "left_semi")
    val leftRest = left.join(hot, Seq(key), "left_anti")
    saltedJoin(leftHot, right, key, salts, saltBy)
      .unionByName(leftRest.join(right, Seq(key)))
  }
}
