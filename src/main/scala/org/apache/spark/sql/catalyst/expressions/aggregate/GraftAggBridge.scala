package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for `private[aggregate]` internals — see
  * [[org.apache.spark.sql.GraftSqlBridge]] for the user-facing wrapper and
  * the rationale.
  */
object GraftAggBridge {
  def collectTopK(e: Expression, k: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(e, k, reverse)
}
