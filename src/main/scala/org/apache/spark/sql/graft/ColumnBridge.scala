package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> catalyst Expression bridge. Spark 4 scopes these
 * conversions `private[sql]`, so the shim lives under
 * `org.apache.spark.sql` — the standard extension-library pattern for
 * exposing custom native Expressions as Columns without forcing every
 * call site through a registered SQL function name.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
