package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals needed to expose custom
  * Catalyst expressions as user-facing `Column`s (the supported extension
  * pattern for libraries that add native expressions).
  */
object GraftSqlBridge {
  /** `private[sql]` in Spark; aliased so graft code can override
    * `ExpectsInputTypes.inputTypes`.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
