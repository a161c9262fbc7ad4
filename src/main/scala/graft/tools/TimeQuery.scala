package graft.tools

import graft.{Graft, SparkEntry}

/** Time a few declared queries in one warm JVM — the focused follow-up
  * to a Bench anomaly (full Bench re-runs everything; this re-measures
  * just the suspects, same tuning, min-of-N per query).
  *
  * Usage: runMain graft.tools.TimeQuery <name[,name...]> [sfDir] [passes]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Graft.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.tune(spark)
    val best = scala.collection.mutable.Map[String, Double]()
    for (p <- 1 to passes; n <- names) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[time] pass$p $n%-28s $dt%8.2f s  rows=$rows")
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), dt)
      spark.catalog.clearCache()
    }
    best.toSeq.sortBy(_._1).foreach { case (n, t) =>
      println(f"[time] best  $n%-28s $t%8.2f s") }
    spark.stop()
  }
}
