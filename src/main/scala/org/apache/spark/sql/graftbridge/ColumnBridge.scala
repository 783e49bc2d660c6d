package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the
  * standard third-party-connector pattern for exposing a custom
  * Catalyst expression through the public Column API (the alternative,
  * session-wide SQL registration, is provided by
  * `graft.functions.GraftExtensions`; this bridge serves callers that
  * never touch the session config).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Imperative function registration on a LIVE session — unlike
    * `spark.sql.extensions`, this also works when `getOrCreate`
    * returned a pre-existing session the extension never saw.
    */
  def registerFunction(
      session: SparkSession,
      fid: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(fid, info, builder)
}
