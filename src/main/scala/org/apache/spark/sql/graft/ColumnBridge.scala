package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (ExpressionUtils). Extensions shipping custom Catalyst expressions need
  * exactly these two hooks, so this shim lives in the org.apache.spark.sql
  * namespace — the standard pattern for Spark extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. [[expression]] wraps the node
    * lazily (ColumnNodeExpression), which is fine inside Dataset API
    * trees where the analyzer unwraps it — but a SQL function builder's
    * return value must be a plain catalyst tree (UnresolvedFunction
    * children get resolved in place; a lazy wrapper reaches codegen
    * unconverted and dies with INTERNAL_ERROR). */
  def convert(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
