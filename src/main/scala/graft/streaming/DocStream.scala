package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text

/** Streaming ingest of a document feed (the crawl-snapshot arrival path):
  * stateless quality/fingerprint enrichment, then watermarked exact
  * dedup — the streaming twin of the batch x5/x2 pipeline stages.
  *
  * State posture at scale: the only stateful operator is
  * `dropDuplicatesWithinWatermark` keyed on the 16-byte fingerprint, so
  * state is bounded by (arrival rate × watermark), never corpus size —
  * re-crawls beyond the watermark are handled by the BATCH incremental
  * path (x25/x29's fingerprint index), which is the division of labor
  * production pipelines use: streaming absorbs the at-least-once burst,
  * batch owns history.
  */
object DocStream {

  /** Parquet schema of the documents table as stored. */
  val storedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based stream over a directory of documents parquet. The feed
    * carries no arrival time, so event time is derived deterministically
    * from the id (1 s per doc from a fixed epoch) — replicable in the
    * batch twin, which is what lets stream==batch be asserted exactly.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(storedSchema).parquet(dir)
      .withColumn("ts", timestamp_seconds(lit(1577836800L) + col("doc_id")))

  /** Stateless enrichment: content fingerprint (lang + text, the x5 key)
    * and the quality signals a filter stage consumes. Pure column
    * expressions — works identically on a stream or a batch frame.
    */
  def enrich(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", md5(concat_ws("", col("lang"), col("text"))))
      .withColumn("n_tokens", Text.tokenCount(col("text")))
      .withColumn("quality", Text.qualityScore(col("text")))

  /** Enriched feed with at-least-once redeliveries dropped inside the
    * watermark (exact dedup on the content fingerprint).
    */
  def cleanFeed(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    enrich(docs)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Batch twin of [[cleanFeed]] over the stored documents table: the
    * SAME `enrich` column expressions, the same id-derived event time as
    * [[read]], and exact dedup on the fingerprint keeping the EARLIEST
    * arrival — which is what the stream's within-watermark dedup
    * retains for redeliveries arriving inside the watermark (the only
    * redeliveries the streaming half is responsible for; older
    * re-crawls belong to the batch incremental path, x25/x29). This is
    * the declared, oracle-checked face of the DocStream semantics
    * (e9_docfeed_clean).
    */
  def cleanFeedBatch(docs: DataFrame): DataFrame = {
    val withTs = docs.withColumn("ts",
      timestamp_seconds(lit(1577836800L) + col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy(col("ts").asc, col("doc_id").asc)
    enrich(withTs)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
