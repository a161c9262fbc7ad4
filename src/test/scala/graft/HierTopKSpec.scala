package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Invariants of the corpus-scaled hierarchical topK family (round 8):
  * the exactness boundary of the two-level approximation, equivalence of
  * the prebuilt-centroid and self-build hierarchy paths, probe-count
  * contracts, and hierarchical-Lloyd determinism.
  */
class HierTopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Graft.table(spark, dir, "embeddings")

  test("ivfTopKHier == flat ivfTopK when every super is probed") {
    // With superProbe >= ceil(√nCells) the probe stage sees EVERY leaf,
    // so the two-level assignment degenerates to the exact flat argmax:
    // both corpus cells and probe cells must be identical, and so must
    // the final ranking. nCells=9 → nSuper=3 ≤ superProbe=3.
    val q = emb.filter(col("vec_id") < 5)
    val hier = Similarity.ivfTopKHier(q, emb, "vec_id", "embedding",
        topK = 5, nCells = 9, nProbe = 2, superProbe = 3)
      .orderBy("qid", "rn").collect()
    val flat = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
        topK = 5, nCells = 9, nProbe = 2, exact = true)
      .orderBy("qid", "rn").collect()
    assert(hier.length == flat.length && hier.length > 0)
    hier.zip(flat).foreach { case (h, f) =>
      assert(h == f, s"hier/flat diverged at full super coverage: $h vs $f")
    }
  }

  test("prebuilt literal seed centroids == self-built hierarchy") {
    // The seedDyn memo contract: a COLLECTED-LITERAL copy of the nCells
    // lowest-id vectors must produce the identical hierarchy (supers =
    // lowest cells, leaf→super map) and therefore identical results to
    // the self-build path that derives seeds in-plan.
    val q = emb.filter(col("vec_id") < 5)
    val nc = 16
    val literal = Similarity.seedCentroidsLiteral(emb, "vec_id",
      "embedding", nc)
    val self = Similarity.ivfTopKHier(q, emb, "vec_id", "embedding",
        topK = 5, nCells = nc, nProbe = 6, superProbe = 4)
      .orderBy("qid", "rn").collect()
    val pre = Similarity.ivfTopKHier(q, emb, "vec_id", "embedding",
        topK = 5, nCells = nc, nProbe = 6, superProbe = 4,
        prebuiltCentroids = Some(literal))
      .orderBy("qid", "rn").collect()
    assert(self.length == pre.length && self.length > 0)
    self.zip(pre).foreach { case (a, b) => assert(a == b) }
  }

  test("quantizerCellsHier: total keep-1 cover, cells from the quantizer") {
    val nc = 16
    val cents = Similarity.seedCentroidsLiteral(emb, "vec_id",
      "embedding", nc)
    val cells = Similarity.quantizerCellsHier(emb, "vec_id", "embedding",
      nc, cents).collect()
    assert(cells.length == emb.count(), "keep-1 must cover every row once")
    val cellIds = cells.map(_.getAs[Long]("cell")).toSet
    val centIds = cents.collect().map(_.getLong(0)).toSet
    assert(cellIds.subsetOf(centIds), "cell labels must be centroid ids")
  }

  test("ivfTopKHier: per-query contracts (rn contiguity, bounds, dedup)") {
    val q = emb.filter(col("vec_id") < 8)
    val out = Similarity.ivfTopKHier(q, emb, "vec_id", "embedding",
        topK = 5, nCells = 16, nProbe = 6, superProbe = 4)
      .collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 8)
    byQ.foreach { case (qid, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getAs[Int]("rn")).sorted.toSeq ==
        (1 to rows.length), s"rn not contiguous for $qid")
      val nids = rows.map(_.getAs[Long]("vec_id"))
      assert(nids.distinct.length == nids.length, s"dup neighbor for $qid")
      assert(!nids.contains(qid), "self-match must be excluded")
      // ranking is by descending sim with id tiebreak
      val sims = rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("kmeansCentroids hierTrain: deterministic; == flat at full coverage") {
    // Same degenerate-coverage argument as the topK test: with
    // superProbe >= nSuper the hierarchical train assignment equals the
    // flat argmax, so BOTH Lloyd variants must produce bit-identical
    // centroids there — and each must be deterministic across runs.
    def run(hier: Boolean) = Similarity.kmeansCentroids(emb, "vec_id",
        "embedding", nCells = 9, iterations = 2, trainCap = 351,
        hierTrain = hier, superProbe = 3)
      .orderBy("cell").collect()
    val h1 = run(hier = true)
    val h2 = run(hier = true)
    val f = run(hier = false)
    assert(h1.length > 0 && h1.length <= 9)
    h1.zip(h2).foreach { case (a, b) => assert(a == b, "nondeterministic") }
    assert(h1.length == f.length)
    h1.zip(f).foreach { case (a, b) =>
      assert(a == b, s"hier train != flat at full super coverage: $a vs $b")
    }
  }
}
