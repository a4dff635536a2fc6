package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Catalyst Expression bridge for graft's native expressions.
 * Spark 4 moved these conversions behind `private[sql]`
 * (org.apache.spark.sql.classic.ExpressionUtils), so the accessor lives in
 * a package under org.apache.spark.sql — the documented extension pattern
 * for libraries shipping custom codegen expressions.
 */
object GraftBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
