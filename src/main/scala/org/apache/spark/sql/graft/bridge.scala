package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Column <-> Catalyst Expression bridge for Spark 4, where the converters
  * (`ExpressionColumnNode`, `ColumnNodeToExpressionConverter`) became
  * `private[sql]` after the Column/ColumnNode split. Extension libraries
  * place this shim inside the `org.apache.spark.sql` package to keep
  * building typed Columns from custom codegen expressions — the same
  * technique used by the public Spark-extension ecosystem.
  */
object bridge {
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))

  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Register a temp function builder into an existing session's registry
    * (the runtime counterpart of SparkSessionExtensions.injectFunction). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
