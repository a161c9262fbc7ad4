package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge for registering COMPOSED column functions (trees built from
  * `org.apache.spark.sql.functions`) in the FunctionRegistry, which
  * wants `Seq[Expression] => Expression` builders. Lives in the
  * spark.sql package to reach the `private[sql]` Column <-> Expression
  * converters; contains no logic beyond the two conversions.
  *
  * The eager `ColumnNodeToExpressionConverter` is required here:
  * `ExpressionUtils.expression` wraps the node in a LAZY
  * `ColumnNodeExpression` that only DataFrame analysis unwraps — inside
  * a registry builder it would reach codegen unresolved. The converter
  * emits a plain Catalyst tree (with `UnresolvedFunction` leaves the
  * analyzer then resolves like any SQL).
  */
object GraftColumnBridge {
  def liftUnary(f: Column => Column): Seq[Expression] => Expression =
    es => ColumnNodeToExpressionConverter(f(ExpressionUtils.column(es.head)).node)
}
