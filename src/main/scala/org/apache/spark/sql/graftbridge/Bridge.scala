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

  /** Drop the `originStats` a `Dataset.localCheckpoint` carries over from
    * its optimized plan. Catalyst's size-only join estimate is the PRODUCT
    * of child sizes, so an ITERATIVE join loop over checkpointed frames
    * compounds the BigInt sizeInBytes multiplicatively round over round —
    * deep enough loops leave the driver grinding million-digit
    * BigInteger multiplications inside plan statistics (measured in the
    * graft connected-components loop: 7 s → 354 s at 13 rounds). The
    * checkpointed data and truncated lineage are untouched; only the
    * inherited Statistics (and constraints, derived from the same
    * optimized plan) are reset so each round plans against fresh
    * scan-sized stats. No-op for plans that aren't a bare LogicalRDD. */
  def resetInheritedStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    classic.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(
          classic.sparkSession, lr.copy()(classic.sparkSession, None, None))
      case _ => df
    }
  }
}
