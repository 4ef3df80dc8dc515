package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable engine query: a Spark DataFrame builder over a testdata
 * directory, plus (when SQL-expressible) an equivalent DuckDB oracle used
 * by the driver's correctness gate. Column names/types must line up
 * exactly between the two — every computed column is aliased on both
 * sides, fractional SQL literals are CAST to DOUBLE (DuckDB parses them
 * as DECIMAL), and double aggregations go through exact DECIMAL sums.
 */
final case class QuerySpec(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
