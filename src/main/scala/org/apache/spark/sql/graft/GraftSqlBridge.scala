package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** The one compilation unit inside Spark's namespace. `Column ⇄ Expression`
  * conversion and session-state access became `private[sql]` in Spark 4's
  * Connect refactor; a minimal in-namespace bridge is the established
  * pattern for extension libraries that ship native Catalyst expressions
  * (Delta and Iceberg use the same technique). Everything graft-specific
  * lives in the `graft.*` packages — this file only re-exports access.
  */
object GraftSqlBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Idempotent imperative function registration (the non-`spark.sql.extensions`
    * route, for sessions built before the library was on the classpath). */
  def registerFunction(spark: SparkSession, ident: FunctionIdentifier,
                       info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
  }
}
