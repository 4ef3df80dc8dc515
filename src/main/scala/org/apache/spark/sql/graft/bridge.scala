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
