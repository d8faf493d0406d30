package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for Spark 4 classic mode.
  *
  * Spark 4's Column wraps a ColumnNode and no longer exposes `.expr`; the
  * classic-mode converter (o.a.s.sql.classic.ExpressionUtils) is public at
  * the bytecode level but private[sql] to Scala, so it is invoked via a
  * one-time reflective handle. Cold path only — the hot path is the
  * generated code of the expression being wrapped.
  */
private[graft] object ColumnBridge {
  private lazy val exprUtils = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private lazy val toExprM = exprUtils.getMethod("expression", classOf[Column])
  private lazy val toColumnM = exprUtils.getMethod("column", classOf[Expression])

  def toExpr(c: Column): Expression = toExprM.invoke(null, c).asInstanceOf[Expression]
  def toColumn(e: Expression): Column = toColumnM.invoke(null, e).asInstanceOf[Column]
}
