package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's private[sql] Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Lives under
  * org.apache.spark.sql so the private[sql] members resolve — the
  * standard pattern for third-party Catalyst expression libraries.
  * Nothing else in this repo lives outside the graft namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Structural type equality modulo nullability flags — parquet
    * round trips and aggregate output schemas disagree on
    * nullable/containsNull for IDENTICAL value types, and
    * `DataType.equalsIgnoreNullability` is private[sql].
    */
  def sameTypeIgnoringNullability(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType.equalsIgnoreNullability(a, b)

  /** Expose the private[sql] optimizer-rule builder so specs can
    * assert what a SparkSessionExtensions instance injects.
    */
  def optimizerRules(
      e: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Seq[
      org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    e.buildOptimizerRules(spark)
}
