package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 hides the Expression-backed
  * Column constructor behind `private[sql]` (`classic.ExpressionUtils`);
  * this one-object shim in a `sql` sub-package re-exports it for graft's
  * native expressions. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply an extensions object's function injections to a live session's
    * registry (test hook: `spark.sql.extensions` is only honored at session
    * construction, which a shared test session has already passed). */
  def applyFunctionInjections(ext: org.apache.spark.sql.SparkSessionExtensions,
                              spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
