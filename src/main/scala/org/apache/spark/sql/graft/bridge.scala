package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * graft can expose custom Catalyst expressions (e.g.
  * [[graft.plans.VecDot]]) as ordinary `Column`s. Lives in the
  * `org.apache.spark.sql` package solely for access; no Spark internals
  * are modified.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
