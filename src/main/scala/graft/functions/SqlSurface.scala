package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-registry entries for the COMPOSED column functions — cleaning /
  * text helpers that are plain `org.apache.spark.sql.functions` trees
  * (no custom Expression class, so nothing new to codegen: the builder
  * inlines the exact tree a DataFrame caller gets). Registering them
  * makes `spark.sql("SELECT canonicalize_url(u) FROM t")` work for
  * pure-SQL users, same as the native expressions in
  * [[graft.expressions.VectorExpressions]].
  */
object SqlSurface {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "canonicalize_url" -> GraftColumnBridge.liftUnary("canonicalize_url", Clean.canonicalizeUrl),
    "doc_fingerprint" -> GraftColumnBridge.liftUnary("doc_fingerprint", Text.fingerprint),
    "token_count" -> GraftColumnBridge.liftUnary("token_count", Text.tokenCount),
    "clean_street" -> GraftColumnBridge.liftUnary("clean_street", Clean.cleanStreet))

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      if (!spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier(name)))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          name, builder, "built-in")
    }

  /** SparkSessionExtensions injection descriptions (for
    * `graft.GraftExtensions` / spark.sql.extensions).
    */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    functions.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[SqlSurface.type].getName, name),
        builder)
    }
}
