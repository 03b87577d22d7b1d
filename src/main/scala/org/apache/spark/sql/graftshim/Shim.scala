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

  /** True iff the session's CacheManager holds no cached-plan entries.
    * Test-support: operators that materialize bounded intermediates
    * must not leave driver-lifetime cache registrations behind
    * (a `persist()` without `unpersist()` pins its plan in the
    * CacheManager forever; `localCheckpoint` blocks are instead
    * released by the ContextCleaner when the consumer drops them). */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Register a native expression builder under `name` (idempotent and
    * silent: re-registering an already-present function would log a
    * "replaced a temporary function" warning per call, which pollutes
    * harness stdout/stderr — skip when the name is already bound). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry =
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Register-or-REPLACE variant for functions bound to session state
    * (e.g. a trained model captured in the builder): re-registration
    * must rebind, not silently keep the stale capture. */
  def replaceFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
