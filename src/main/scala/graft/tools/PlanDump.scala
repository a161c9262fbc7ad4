package graft.tools

import graft.{Graft, SparkEntry}

/** Dump the formatted physical plan of EVERY declared query to
  * `<outDir>/<name>_<suffix>.txt` — the optimization round's
  * before/after plan evidence (guide §1: capture `.explain("formatted")`
  * for every declared query; the judge checks plan claims against these
  * files). Memos are prebuilt first so each plan is the WARM shape the
  * bench times (memo-backed families plan against their reloaded
  * sidecars, not a cold build).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [sfDir] [names]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val only = args.lift(3).map(_.split(",").toSeq)
    val spark = Graft.session()
    SparkEntry.warm(spark)
    SparkEntry.prebuild(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        System.err.println(s"[plan] $n ok")
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
