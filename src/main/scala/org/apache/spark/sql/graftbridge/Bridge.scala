package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for graft's custom expressions.
  *
  * Spark 4 made the converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); third-party
  * expression libraries conventionally re-export them from an
  * `org.apache.spark.sql.*` subpackage (the same access pattern Sedona /
  * frameless use). This is the only file outside the `graft` namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converted catalyst tree. [[expression]] returns a LAZY
    * `ColumnNodeExpression` wrapper whose children are ColumnNodes —
    * invisible to `Expression.transform`; this runs the session
    * converter first so tree rewrites (e.g. Closest's tie-expression
    * attribute suffixing) actually see the attributes. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Free the block storage behind a `localCheckpoint()`ed DataFrame.
    * A checkpointed plan is a `LogicalRDD` leaf whose RDD stays
    * persisted until explicitly unpersisted; `Dataset.unpersist` only
    * talks to the CacheManager and does not know about it. No-op for
    * non-checkpointed plans. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
