package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
import org.apache.spark.sql.types.BinaryType

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
  /** Builder for a 1-arg SQL function. Wrong arity fails ANALYSIS with
    * the standard WRONG_NUM_ARGS error (extra args must not be silently
    * ignored; zero args must not surface as a NoSuchElementException
    * from `es.head`).
    */
  def liftUnary(name: String, f: Column => Column): Seq[Expression] => Expression = {
    case Seq(e) => ColumnNodeToExpressionConverter(f(ExpressionUtils.column(e)).node)
    case es => throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> ("`" + name + "`"),
        "expectedNum" -> "1",
        "actualNum" -> es.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
  }

  /** Stable session identity for per-session memos: the classic
    * session's `sessionUUID` (a `private[sql]` member, hence bridged
    * here) — identityHashCode can in principle collide across sessions
    * after GC.
    */
  def sessionKey(s: SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => String.valueOf(System.identityHashCode(other))
  }

  /** Probe a serialized `org.apache.spark.util.sketch.BloomFilter`
    * (`writeTo` bytes) with a LONG-valued column — the same
    * `BloomFilterMightContain` predicate Spark's runtime-filter rewrite
    * injects, with the sketch as a foldable binary literal so the probe
    * stays inside whole-stage codegen and needs no UDF. The caller is
    * responsible for probing with the SAME key the sketch was built
    * over (`mightContainLong` semantics on both sides).
    */
  def mightContainLong(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ColumnNodeToExpressionConverter(value.node)))
}
