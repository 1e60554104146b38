package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge (round 18). Spark 4 made the Column ↔
  * Catalyst boundary `private[sql]` (`classic.ExpressionUtils`); a
  * config-carrying native expression like
  * [[graft.functions.BpeEncodeIds]] — whose merge table and vocabulary
  * are plain constructor data, not child expressions — needs it to
  * become a `Column` without forcing the config through 30k-element
  * literal plumbing and the `FunctionRegistry`. This is the one
  * `org.apache.spark.sql` package-escape in the repo; everything it
  * exposes is a two-line delegation to public-jar Spark code. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
