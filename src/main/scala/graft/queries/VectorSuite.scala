package graft.queries

import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.functions.Vectors
import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table.
  *
  * The oracle-checked variants use exact DECIMAL dot products (order-
  * independent, bit-identical in DuckDB); the LSH/ANN variants are
  * Spark-only (rows-only driver check) since DuckDB has no equivalent.
  */
object VectorSuite {

  // DuckDB: exact-decimal dot product of two 64-dim FLOAT lists.
  private def sqlDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), i -> CAST(CAST($a[i] AS DOUBLE) AS DECIMAL(18,7)) * CAST(CAST($b[i] AS DOUBLE) AS DECIMAL(18,7)))) AS DOUBLE)"
  private def sqlCos(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"

  val queries: Map[String, Q] = Map(

    // --- vector norms (sanity + exercises the decimal dot) ------------
    "v1_norms" -> Q(
      (s, dir) =>
        table(s, dir, "embeddings")
          .filter(col("vec_id") < 100)
          .select(col("vec_id"), Vectors.norm2(col("embedding")).as("l2norm"))
          .orderBy("vec_id"),
      Some(s"""SELECT vec_id, sqrt(${sqlDot("embedding", "embedding")}) AS l2norm
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin),
      "L2 norms via exact-decimal self-dot (zip_with/aggregate expressions)"),

    // --- brute-force cosine top-k -------------------------------------
    "v2_cosine_topk" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
        Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", topK = 5)
          .orderBy("qid", "rn")
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id, ${sqlCos("q.qvec", "e.embedding")} AS sim
        |  FROM embeddings e CROSS JOIN q WHERE q.qid <> e.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
        |  FROM scored)
        |SELECT qid, vec_id, sim, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= 5
        |ORDER BY qid, rn""".stripMargin),
      "Brute-force cosine top-k: broadcast queries, map-only scoring, window top-k"),

    // --- per-label centroid similarity (agg over vectors) -------------
    "v3_label_centroid_sim" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        // mean vector per label with exact decimal accumulation:
        // sum each dimension as decimal, divide by count (double).
        val summed = emb.groupBy("label")
          .agg(
            count(lit(1)).as("n"),
            array(
              (0 until 64).map(i =>
                sum(element_at(col("embedding"), i + 1).cast("double")
                  .cast("decimal(18,7)")).cast("double")): _*).as("sumvec"))
        summed.select(col("label"), col("n"),
            transform(col("sumvec"), x => x / col("n").cast("double")).as("centroid"))
          .select(col("label"), col("n"),
            round(Vectors.dotFast(col("centroid"), col("centroid")), 6).as("centroid_sq"))
          .orderBy("label")
      },
      Some {
        val sums = (1 to 64).map(i =>
          s"CAST(SUM(CAST(CAST(embedding[$i] AS DOUBLE) AS DECIMAL(18,7))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)").mkString(", ")
        s"""WITH cent AS (
          |  SELECT label, COUNT(*) AS n, [$sums] AS centroid
          |  FROM embeddings GROUP BY label)
          |SELECT label, n,
          |  round(list_sum(list_transform(range(1, 65), i -> centroid[i] * centroid[i])), 6) AS centroid_sq
          |FROM cent ORDER BY label""".stripMargin
      },
      "Per-label centroid (IVF coarse-quantizer build step), exact decimal sums"),

    // --- LSH-bucketed ANN (Spark-only, rows-only check) ---------------
    "v4_lsh_ann_topk" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
        Similarity.lshTopK(q, emb, "vec_id", "embedding", topK = 5,
            bits = 6, tables = 4)
          .orderBy("qid", "rn")
      },
      None,
      "Random-hyperplane LSH ANN: bucket equi-join prunes the scan; multi-probe recall"),

    "v6_ivf_ann_topk" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
        Similarity.ivfTopK(q, emb, "vec_id", "embedding", topK = 5,
            nCells = 16, nProbe = 3)
          .orderBy("qid", "rn")
      },
      None,
      "IVF coarse-quantizer ANN: assign to cells, probe nProbe nearest cells"),

    "v5_cosine_neardups" -> Q(
      (s, dir) =>
        Similarity.cosineNearDups(table(s, dir, "embeddings"), "vec_id",
            "embedding", threshold = 0.6, bits = 4, tables = 2)
          .orderBy("id1", "id2"),
      None,
      "Embedding-cosine near-duplicate detection via LSH buckets")
  )
}
