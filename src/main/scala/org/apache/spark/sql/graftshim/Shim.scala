package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Spark internals (Column <-> Expression
  * conversion and the session FunctionRegistry). Lives under
  * `org.apache.spark.sql` for access; the standard pattern for libraries
  * that ship native Catalyst expressions.
  */
object Shim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a native expression builder under `name` (idempotent). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
