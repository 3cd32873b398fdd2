package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals, the standard
  * technique for Spark-native libraries that ship custom Catalyst
  * expressions: Column ⇄ Expression conversion and session-local function
  * registration. Nothing else from the internal API is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a session-local SQL function (idempotent overwrite).
    * classic.SparkSession.sessionState is private[sql]; this compiles
    * because the bridge lives inside the sql package tree.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder)

  /** True iff `name` is already registered in this session — lets callers
    * make registration idempotent WITHOUT the registry's "function
    * replaced" warning on every re-register.
    */
  def functionExists(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.functionExists(FunctionIdentifier(name))
}
