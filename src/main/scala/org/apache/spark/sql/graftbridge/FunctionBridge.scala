package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the `private[sql]` session state for registering a SQL
  * function on an EXISTING session. `SparkSessionExtensions` covers the
  * from-scratch path (`withExtensions` on the first builder in the JVM);
  * this covers sessions that already exist — REPLs, shared test
  * sessions, notebook environments — where the builder has already run.
  */
object FunctionBridge {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(new FunctionIdentifier(name), info, builder)

  /** Remove a function registered via [[register]] (tests on shared
    * sessions must be able to restore the pre-install state). */
  def drop(spark: SparkSession, name: String): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .dropFunction(new FunctionIdentifier(name))
}
