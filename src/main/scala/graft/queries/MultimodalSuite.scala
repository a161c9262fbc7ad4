package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.Multimodal
import graft.pipelines.MultimodalFixture

/** Multimodal binary-column queries over the ≥100 MB asset fixture
  * (pipelines.MultimodalFixture): the parquet round-trip + decode path
  * the 100 TB claim rests on, oracle-checked.
  *
  * The DuckDB mirror reads the SAME parquet: COUNT/octet_length prove
  * the binary column survives the round trip byte-for-byte in size, and
  * COUNT(DISTINCT md5(hex(media))) proves it byte-for-byte in CONTENT
  * (hex() is the one blob accessor both engines share; Spark feeds the
  * same hex string to md5 via encode(…,'utf-8')).
  */
object MultimodalSuite {

  private def assets(s: SparkSession): DataFrame = {
    MultimodalFixture.ensure(s)
    Graft.tune(s)
    // binary scans arrive byte-packed (few partitions for 128 MB);
    // decode is CPU-dense per row → spread to the session's cores.
    // At 100 TB the scan is already thousands of partitions → no-op.
    Graft.ensureParallelism(s.read.parquet(MultimodalFixture.assetsPath))
  }

  private def A = s"read_parquet('${MultimodalFixture.assetsPath}/*.parquet')"

  val queries: Map[String, Q] = Map(

    // --- decode + content-integrity stats -----------------------------
    "m1_decode_roundtrip" -> Q(
      (s, _) => {
        import s.implicits._
        val decoded = Multimodal.decode(assets(s).as[Multimodal.Asset])
          .agg(count(lit(1)).as("n"),
            sum(col("byte_size")).as("total_bytes"))
        val content = assets(s)
          .agg(countDistinct(md5(encode(hex(col("media")), "utf-8")))
            .as("n_distinct"))
        decoded.crossJoin(content)
      },
      Some(s"""SELECT COUNT(*) AS n,
        |  CAST(SUM(octet_length(media)) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT md5(hex(media))) AS n_distinct
        |FROM $A""".stripMargin),
      "Multimodal: 128 MB binary round-trip + per-partition batched decode; " +
        "content integrity via shared hex/md5 fingerprint"),

    // --- per-media-type byte histogram (metadata pushdown shape) ------
    "m2_bytes_by_type" -> Q(
      (s, _) => assets(s)
        .groupBy("media_type")
        .agg(count(lit(1)).as("n"),
          sum(length(col("media"))).as("bytes"))
        .orderBy("media_type"),
      Some(s"""SELECT media_type, COUNT(*) AS n,
        |  CAST(SUM(octet_length(media)) AS BIGINT) AS bytes
        |FROM $A GROUP BY 1 ORDER BY media_type""".stripMargin),
      "Multimodal: byte histogram by media type over the binary column"))
}
