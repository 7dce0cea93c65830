package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed accessor for the `private[sql]` Column↔Expression
  * conversion — the standard technique Spark extension libraries use
  * when a rule built on the public Dataset API needs to re-wrap a
  * Catalyst expression (here: `plans/SummaryRewrite` rebasing a
  * dim-only predicate onto the summary scan). Kept to this single
  * forwarder so the private-API surface we touch stays one line. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
