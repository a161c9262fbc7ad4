package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal

/** Streaming ingest of an AUDIO feed with PERCEPTUAL dedup — the m15
  * sign hash at the stream gate, completing the streaming near-dup set
  * across every modality (documents / vectors / images / video /
  * audio): per micro-batch, decode every arriving clip's PCM samples,
  * compute the 64-bit window-amplitude-delta sign hash
  * ([[Multimodal.audioDHash]] — gain-invariant by construction), and
  * run the exact [[MediaStream]] single-signature machinery: within-
  * batch clusters to canonicals, cross-check against the at-rest
  * fingerprint index, novel fingerprints appended, duplicate arrivals
  * quarantined with their best match. A gain-changed or requantized
  * copy of an already-ingested recording — zero shared bytes — is
  * caught at the gate. Payloads that don't parse as ≥65-frame 16-bit
  * PCM are quarantined loudly (reason "undecodable" — no usable
  * fingerprint). State posture and idempotency are MediaStream's:
  * (id, 8-byte sig, byte size) rows at rest, batch-id-partitioned
  * dynamic-overwrite writes.
  */
object AudioStream {

  /** Parquet schema of the audio feed as stored. */
  val storedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("media_type", StringType),
    StructField("media", BinaryType)))

  /** File-based stream; event time MONOTONE in the id (the house rule —
    * a modular wrap would step below the watermark and silently drop
    * later arrivals as late).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(storedSchema).parquet(dir)
      .withColumn("ts",
        timestamp_seconds(lit(1577836800L) + col("asset_id")))

  def nearDupIngest(spark: SparkSession, feedDir: String, indexDir: String,
      quarantineDir: String, checkpointDir: String,
      maxHamming: Int = 7, watermark: String = "1 hour")
      : org.apache.spark.sql.streaming.StreamingQuery =
    read(spark, feedDir)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("asset_id")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, indexDir, quarantineDir, maxHamming)
      }
      .start()

  /** One micro-batch (exposed for direct testing). */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      indexDir: String, quarantineDir: String, maxHamming: Int): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    MediaStream.sigIngestBatch(batch, batchId, indexDir, quarantineDir,
      maxHamming,
      b => Multimodal.audioDHash(
          b.select("asset_id", "media_type", "media")
            .as[Multimodal.Asset]).toDF()
        .select(col("asset_id").as("id"), col("dhash").as("sig")))
  }
}
