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
      // hier = the two-level assignment cosineNearDupsIvf now self-builds;
      // flat = the O(n·nCells) baseline it replaced (recall reference)
      val gotH = pairs(Similarity.cosineNearDupsIvf(
        emb, "vec_id", "embedding", 0.4, nCells = cells, nProbe = probe,
        tables = tables))
      // the cheaper superProbe=2 rung (self-build defaults to 3)
      val gotH2 = pairs(Similarity.cosineNearDupsIvf(
        emb, "vec_id", "embedding", 0.4, nCells = cells, nProbe = probe,
        tables = tables,
        prebuiltAssigned = Some(Similarity.multiQuantizerCells(
          emb, "vec_id", "embedding", cells, probe, tables,
          superProbe = 2))))
      val gotF = pairs(Similarity.cosineNearDupsIvf(
        emb, "vec_id", "embedding", 0.4, nCells = cells, nProbe = probe,
        tables = tables,
        prebuiltAssigned = Some(Similarity.multiQuantizerCellsFlat(
          emb, "vec_id", "embedding", cells, probe, tables))))
      def rec(got: Set[(Long, Long)]) = if (exact.isEmpty) 1.0 else
        got.intersect(exact).size.toDouble / exact.size
      val ratio = tables.toDouble * probe * probe / cells
      println(f"[ivf-recall] T=$tables nCells=$cells%3d nProbe=$probe  " +
        f"recallHierSp3=${rec(gotH)}%.3f recallHierSp2=${rec(gotH2)}%.3f " +
        f"recallFlat=${rec(gotF)}%.3f  " +
        f"pairGenCostRatio=$ratio%.2f  pairsH=${gotH.size} pairsF=${gotF.size}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
