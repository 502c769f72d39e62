package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ↔ Expression bridge. Spark 4 made the converters
 * (`classic.ExpressionUtils`) `private[sql]`; this object lives under the
 * `org.apache.spark.sql` package namespace solely to re-export the two
 * conversions needed to expose custom Catalyst expressions as Columns.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a raw Expression builder on an
   * EXISTING session (`sessionState` is also `private[sql]`); new sessions
   * should prefer `spark.sql.extensions=graft.GraftExtensions`. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
