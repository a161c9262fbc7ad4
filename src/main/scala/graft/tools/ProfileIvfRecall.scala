package graft.tools

import graft.Graft
import graft.operators.Similarity

/** Measure IVF-blocked near-dup recall vs the exact all-pairs answer
  * across (nCells, nProbe) — picks the declared v7 parameters from data,
  * not guesswork. Usage: runMain graft.tools.ProfileIvfRecall [sfDir]
  */
object ProfileIvfRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.session()
    val emb = Graft.table(spark, sfDir, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.cosineNearDups(emb, "vec_id", "embedding", threshold = 0.4))
    println(s"[ivf-recall] exact pairs: ${exact.size}")
    for (tables <- Seq(1, 2, 3, 4); cells <- Seq(16, 32); probe <- Seq(2, 3)) {
      val got = pairs(Similarity.cosineNearDupsIvf(
        emb, "vec_id", "embedding", 0.4, nCells = cells, nProbe = probe,
        tables = tables))
      val rec = if (exact.isEmpty) 1.0 else
        got.intersect(exact).size.toDouble / exact.size
      val ratio = tables.toDouble * probe * probe / cells
      println(f"[ivf-recall] T=$tables nCells=$cells%3d nProbe=$probe  " +
        f"recall=$rec%.3f  pairGenCostRatio=$ratio%.2f  pairs=${got.size}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
