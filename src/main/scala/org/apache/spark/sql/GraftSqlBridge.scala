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

  /** Eagerly free the storage blocks behind a `localCheckpoint()`ed frame
    * (or any frame projecting one). The ContextCleaner frees them anyway
    * once the frame is driver-GC'd, but iterative operators that checkpoint
    * per round would otherwise pile up to maxIters copies in executor
    * storage before a GC happens to run. Must only be called once the frame
    * (and everything derived from it that wasn't itself materialized) is no
    * longer needed - a localCheckpoint's blocks are its ONLY copy.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
