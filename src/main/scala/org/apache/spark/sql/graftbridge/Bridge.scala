package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's native
  * Catalyst expressions can be exposed as user-facing `Column`s. Lives under
  * `org.apache.spark.sql` purely for access; no Spark internals are
  * modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion. `expression` wraps the column's
    * node in a LAZY `ColumnNodeExpression` — fine inside DataFrame plans
    * (the analyzer converts it during resolution), but opaque when the
    * expression is returned from an injected SQL function builder: the
    * wrapper never unwraps and fails at codegen as Unevaluable. This
    * converts through `ColumnNodeToExpressionConverter` up front, yielding
    * a plain (unresolved) Catalyst tree the analyzer resolves normally. */
  def eagerExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
