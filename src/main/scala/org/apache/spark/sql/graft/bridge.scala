package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between graft's native Catalyst expressions and the public
 * `Column` API. Spark 4 made `Column` a wrapper over a `ColumnNode`
 * and hid the Expression⇄Column conversions behind
 * `private[sql] ExpressionUtils` (spark-sql `classic/columnNodeSupport
 * .scala`), so library code that builds a Catalyst expression directly
 * needs this one-file shim in the `org.apache.spark.sql` namespace —
 * the standard pattern for Spark-native extensions.
 *
 * Why direct construction instead of `call_function("graft_…", …)`:
 * a name-based call only resolves on a session whose function registry
 * has the kernel registered, which made every operator entry point
 * depend on a `getActiveSession` side channel (absent on foreign
 * threads) or on the caller having installed [[graft.plans.GraftExtensions]].
 * A Column carrying the expression itself analyzes on ANY session —
 * no registry lookup happens at all. The registry registration remains
 * for SQL-text users (`SELECT graft_tokens(...)`).
 */
object ColumnBridge {
  /** Wrap a Catalyst expression as a public Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a classic Column back to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/**
 * Driver-side row comparison with Spark's EXACT ordering semantics
 * (`private[sql] CatalystTypeConverters` + the interpreted ordering the
 * executors run). graft's sampled-boundary range operators sort a
 * bounded key sample on the driver and then binary-search each row
 * against the sorted boundaries IN-PLAN — that search is only correct
 * if the driver sort agrees with the executor's `>=` on every pair
 * (e.g. Java `String.compareTo` is UTF-16 code-unit order while
 * UTF8String compares unsigned UTF-8 bytes: they diverge on
 * supplementary characters, so a hand-rolled driver ordering can
 * produce a non-monotone bucket function and silently break global
 * contiguity). Routing through Catalyst's own converter + ordering
 * removes the approximation entirely.
 */
object RowOrderingBridge {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.catalyst.CatalystTypeConverters
  import org.apache.spark.sql.catalyst.util.TypeUtils
  import org.apache.spark.sql.types.StructType

  /** Ordering over externally-collected [[Row]]s of `schema`, equal to
    * Spark's ascending-nulls-first struct comparison. Rows are
    * converted to Catalyst form once per compare; for sorting a
    * bounded sample this is far from hot. */
  def externalRowOrdering(schema: StructType): Ordering[Row] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val ord = TypeUtils.getInterpretedOrdering(schema)
    new Ordering[Row] {
      def compare(a: Row, b: Row): Int = ord.compare(conv(a), conv(b))
    }
  }
}
