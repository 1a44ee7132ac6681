package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge for the engine's native expressions.
  *
  * Spark 4 removed the public `new Column(Expression)` constructor; the
  * replacement (`classic.ExpressionUtils`) is `private[sql]`. This shim —
  * the standard pattern for Spark extension libraries — lives under
  * `org.apache.spark.sql` solely to re-export those two conversions so the
  * library's Column-level APIs (e.g. `Similarity.cosine`) work on any
  * session without per-session function registration.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
