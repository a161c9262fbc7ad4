package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.Similarity

/** Measure PQ-ADC top-k recall vs the exact squared-L2 top-k (the metric
  * PQ approximates) across (m, nCodes, iterations), plus the IVF-PQ
  * composition across nProbe — so the v11/v12 declared parameters come
  * from data. Usage: runMain graft.tools.ProfilePqRecall [sfDir] [nQ] [k]
  */
object ProfilePqRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQ = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Graft.session()
    val emb = Graft.table(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < nQ)

    // exact L2 top-k ground truth (brute force over the query block)
    val exact = q.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(emb.select(col("vec_id").as("id"), col("embedding").as("cv")))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        aggregate(zip_with(col("qv"), col("cv"), (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0d), (a, v) => a + v).as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d").asc, col("id").asc)))
      .filter(col("rn") <= k)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[pq-recall] ground truth: ${exact.size} (qid,id) pairs, k=$k")

    def recall(got: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else got.intersect(exact).size.toDouble / exact.size

    for (m <- Seq(4, 8, 16); nCodes <- Seq(16, 64); it <- Seq(0, 1, 2)) {
      val got = Similarity.pqAdcTopK(q, emb, "vec_id", "embedding", topK = k,
          m = m, nCodes = nCodes, iterations = it)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bytes = m // one byte per subspace code at nCodes <= 256
      println(f"[pq-recall] PQ    m=$m%2d nCodes=$nCodes%3d iters=$it  " +
        f"recall@$k=${recall(got)}%.3f  bytes/vec=$bytes")
      spark.catalog.clearCache()
    }
    // refine ceiling: exact re-rank of the ADC top-R shortlist recovers
    // every true top-k member the shortlist contains, so refined
    // recall@k = |exact ∩ ADC-top-R| / |exact|
    for (r <- Seq(k, 5 * k, 10 * k, 20 * k)) {
      val shortlist = Similarity.pqAdcTopK(q, emb, "vec_id", "embedding",
          topK = r, m = 8, nCodes = 64, iterations = 1)
        .select("qid", "vec_id").collect()
        .map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      println(f"[pq-recall] PQ+refine m=8 nCodes=64 R=$r%3d  " +
        f"recall@$k=${recall(shortlist)}%.3f")
      spark.catalog.clearCache()
    }
    // IVF-PQ: raw-vector codes (one global codebook; the pre-round-6
    // form) vs RESIDUAL codes (IVFADC — codes quantize vec−centroid).
    // Same nCells/m/nCodes budget; residual should dominate.
    for (probe <- Seq(1, 2, 3, 4, 8)) {
      val raw = Similarity.ivfPqTopK(q,
          Similarity.pqIndex(emb, "vec_id", "embedding",
            m = 8, nCodes = 16, iterations = 1),
          "vec_id", "embedding", topK = k, nCells = 16, nProbe = probe)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      def residual(coarseIters: Int): Set[(Long, Long)] = {
        val got = Similarity.ivfPqTopK(q,
            Similarity.ivfPqIndex(emb, "vec_id", "embedding", nCells = 16,
              m = 8, nCodes = 16, iterations = 1,
              coarseKmeansIterations = coarseIters),
            "vec_id", "embedding", topK = k, nProbe = probe,
            hierProbes = false, superProbe = 3)
          .select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        spark.catalog.clearCache()
        got
      }
      val res = residual(0)
      val resKm = residual(2)
      println(f"[pq-recall] IVFPQ nCells=16 nProbe=$probe  " +
        f"raw=${recall(raw)}%.3f  residual=${recall(res)}%.3f  " +
        f"residual+kmeans=${recall(resKm)}%.3f  scanFrac=${probe / 16.0}%.3f")
    }
    spark.stop()
  }
}
