package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only accessor: `SparkSessionExtensions.registerFunctions` is
  * private[sql], so applying an extensions object to a registry (the
  * exact operation session-building performs) needs a probe in this
  * package.
  */
object GraftExtensionsProbe {
  def registeredNames(f: SparkSessionExtensions => Unit): Set[String] = {
    val ext = new SparkSessionExtensions
    f(ext)
    val reg = FunctionRegistry.builtin.clone()
    val before = reg.listFunction().map(_.funcName).toSet
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName).toSet -- before
  }
}
