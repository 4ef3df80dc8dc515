package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Canonical table loader for the engine's test corpus
 * (`/root/testdata/sf*`, see TESTDATA.md).
 *
 * In the reference every pipeline opens its own Sequelize connection per
 * source DB (`Connection/Core/core-connection.js:3-11`); here a source is
 * just a DataFrame, so pipelines stay pure functions over DataFrames and
 * the physical source (parquet / JDBC / Delta) is an injection concern.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) column normalized to a microsecond
    * `TimestampType` (truncating, same as DuckDB's ns→µs cast). Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[Sessions]]). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, dir, "events")
      // `div` = integral division: nanos exceed Double's 2^53 mantissa, so
      // float division here would corrupt timestamps
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
