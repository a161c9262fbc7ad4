package graft.tools
import graft.Graft
import graft.operators.Similarity
import org.apache.spark.sql.functions._
/** Contrast the two-level vs flat multi-table assignment for candidate
  * PAIR volume and per-cell skew at the declared v7/v15 parameters —
  * the measurement behind the hier-assignment recall/cost notes.
  * Usage: runMain graft.tools.PairVol [sfDir]
  */
object PairVol {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = Graft.table(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val nc = Similarity.cellsFor(emb.count())
    def vol(a: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val l = a.as("l"); val r = a.as("r")
      val pairs = l.join(r, col("l.table") === col("r.table") &&
        col("l.cell") === col("r.cell") && col("l.id") =!= col("r.id"))
      (pairs.count(), pairs.select("l.id", "r.id").distinct().count())
    }
    val h = Similarity.multiQuantizerCells(emb, "vec_id", "embedding", nc, 2, 4)
    val f = Similarity.multiQuantizerCellsFlat(emb, "vec_id", "embedding", nc, 2, 4)
    println(s"[pairvol] nc=$nc hier=${vol(h)} flat=${vol(f)}")
    // cell-size distribution
    def dist(a: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val d = a.groupBy("table", "cell").count()
        .agg(min("count"), max("count"), avg("count")).head
      println(s"[pairvol] $tag cell sizes min=${d.get(0)} max=${d.get(1)} avg=${d.get(2)}")
    }
    dist(h, "hier"); dist(f, "flat")
    spark.stop()
  }
}
