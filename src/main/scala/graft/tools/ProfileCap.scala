package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Graft

/** A/B profile of the two df-cap implementations on the x6 candidate
  * shape (explode → cap → same-key self-join → distinct pairs):
  *
  *   A. window count: COUNT(*) OVER (PARTITION BY sh) + filter — one
  *      exchange+sort of the exploded stream, reused by the self-join;
  *   B. aggregate+semi-join: groupBy(sh).count → filter → left_semi —
  *      map-side partial agg, but the exploded stream crosses the wire
  *      for the agg AND the join, and for a near-dedup'd corpus shingle
  *      df ≈ 1 so partial aggregation shrinks nothing.
  *
  * Which wins is a data-shape question (df distribution), not a
  * principle — this tool answers it per corpus. Not engine surface.
  */
object ProfileCap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 1
    val cap = 100
    val spark = Graft.session()

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[cap] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs =
      if (mult == 1) Graft.table(spark, sfDir, "documents")
      else {
        val d = ScaleStress.corpus(spark, sfDir, mult)
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
    val sets = Graft.ensureParallelism(docs)
      .select(col("doc_id").as("id"),
        array_distinct(call_function("word_shingle_hashes",
          col("text"), lit(3))).as("set"))
      .filter(size(col("set")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[cap] sets: ${sets.count()} docs")

    def exploded = sets.select(col("id"), explode(col("set")).as("sh"))

    def pairs(capped: DataFrame): Long = {
      val l = capped.as("l"); val r = capped.as("r")
      l.join(r, col("l.sh") === col("r.sh") && col("l.id") < col("r.id"))
        .select(col("l.id").as("id1"), col("r.id").as("id2"))
        .distinct().count()
    }

    for (round <- 1 to 2) {
      t(s"A_window r$round") {
        val w = Window.partitionBy("sh")
        pairs(exploded.withColumn("__c", count(lit(1)).over(w))
          .filter(col("__c") <= cap).drop("__c"))
      }
      t(s"B_agg_semijoin r$round") {
        val ok = exploded.groupBy("sh").agg(count(lit(1)).as("__c"))
          .filter(col("__c") <= cap).select("sh")
        pairs(exploded.join(ok, Seq("sh"), "left_semi"))
      }
    }
    spark.stop()
  }
}
