package graft.tools

import graft.{Graft, SparkEntry}

/** Per-stage profiler for any DECLARED query — the guide §1 empirical
  * loop without the (disabled) Spark UI: run the query warm (memos
  * prebuilt, min-of-N semantics left to TimeQuery — this tool is about
  * WHERE the time goes, not the headline number) and print every
  * completed stage's wall time, task count, input/shuffle bytes and
  * records, plus max-vs-median task skew.
  *
  * Usage: runMain graft.tools.ProfileQuery <name[,name...]> [sfDir]
  *          [passes] [conf=v,conf=v — runtime-settable SQL confs to A/B]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Graft.session()
    args.lift(3).foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      System.err.println(s"[conf] $k=$v")
    })
    SparkEntry.warm(spark)
    SparkEntry.prebuild(spark, sfDir)
    spark.catalog.clearCache()

    val on = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (!on.get()) return
        val si = sc.stageInfo
        val m = si.taskMetrics
        val dur = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1000.0).getOrElse(0.0)
        if (dur >= 0.05)
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"$dur%6.2f s  in=${m.inputMetrics.bytesRead / 1e6}%8.1f MB " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB/" +
            f"${m.shuffleReadMetrics.recordsRead}%8d " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB " +
            f"gc=${m.jvmGCTime}%5d ms  " +
            si.name.takeWhile(_ != '\n').take(70))
      }
    })

    for (p <- 1 to passes; n <- names) {
      println(s"===== $n pass $p =====")
      on.set(p == passes) // only print stages for the LAST (warm) pass
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // let stage-completed events drain before the total line
      Thread.sleep(300)
      println(f"[total] $n pass$p $dt%8.2f s rows=$rows")
      if (p == passes) {
        // driver-side plan cost (analysis+optimization+physical
        // planning, pre-AQE) measured on a fresh identical frame —
        // how much of the query is plan work rather than stages
        val f2 = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        f2.queryExecution.executedPlan
        println(f"[plan ] $n ${(System.nanoTime() - t1) / 1e9}%8.2f s (analyze+optimize+plan)")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
