package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 hides the classic
  * constructors behind `private[sql]`; extensions conventionally expose
  * them from an `org.apache.spark.sql` subpackage (the same trick every
  * third-party connector/expression library uses). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) custom LogicalPlan — `Dataset.ofRows` is
    * `private[sql]` in Spark 4's classic module; custom-operator libraries
    * expose it through exactly this kind of shim. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
