/* Shim: Spark 4 made Column <-> Expression conversions private[sql];
 * expression-backed columns for custom Catalyst expressions need a bridge
 * in the Spark namespace (the standard pattern for Spark-extension
 * libraries). */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object graftshim {
  def columnOf(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def exprOf(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
