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

  /** Re-root a DataFrame onto another session of the SAME SparkContext
    * without the Row round-trip `createDataFrame(df.rdd, schema)` pays
    * (per-scan InternalRow→Row→InternalRow conversion — measurable when
    * an iteration re-scans the frame every round): the child reads the
    * parent's InternalRow RDD directly. Intended for pinned
    * (localCheckpoint'd) frames handed to a differently-tuned child
    * session — the g1/tunedChild multi-tenant idiom, minus the copy.
    */
  def reRoot(ss: SparkSession, df: DataFrame): DataFrame =
    ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = false)
}
