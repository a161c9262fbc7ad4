package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark-standard library packaging for the graft native functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects `cosine_sim`, `minhash_signature`, `simhash64`,
  * `nfc_normalize`, … into EVERY session built on the cluster — plain
  * `spark.sql("SELECT simhash64(text, 3) FROM docs")` works with no
  * graft import. `Graft.session`/`tune` register the same functions
  * imperatively for programmatic use; this is the zero-code-change
  * path a user switching from the reference would configure once.
  *
  * No custom Rule/Strategy is injected — measured as unnecessary
  * (SURVEY §7.2): the stock planner already produces the target plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.expressions.VectorExpressions.descriptions.foreach(ext.injectFunction)
    graft.functions.SqlSurface.descriptions.foreach(ext.injectFunction)
  }
}
