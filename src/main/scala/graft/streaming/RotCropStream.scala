package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal

/** Streaming ingest of an IMAGE feed with COMPOSED-EDIT (crop ∘
  * rotation) perceptual dedup — the m24 operator at the stream gate
  * (round 16, extending the gate matrix to the composition class the
  * crop and orientation gates each miss alone): per micro-batch,
  * decode every arriving image once and emit the UNION family
  * ([[Multimodal.rotCropDHashStatus]] — 7 upright region-window hashes
  * plus 7 non-identity dihedral full-frame hashes, ≤ 14 × 8 B rows),
  * collapse within-batch family relations to cluster canonicals, check
  * survivors against the accumulated at-rest FAMILY-FINGERPRINT index
  * with the same cross-corpus min-over-cross-product banding, append
  * novel families and quarantine duplicate arrivals. A repost that is
  * mirrored/rotated AND cropped — invisible to the byte gate, the
  * whole-image dHash gate, the crop gate, AND the orientation gate
  * individually (PerceptualDedupSpec measures the family misses) — is
  * caught here at EXACTLY 0 by window-family group closure: family
  * windows map to family windows under every dihedral g, so the
  * indexed base's upright region row equals the arrival's
  * inverse-orientation full-frame row bit for bit.
  *
  * The micro-batch pipeline, state posture, quarantine-reason contract
  * ('undecodable' vs 'too_small'), and replay idempotence all live in
  * the factored [[FamilyStream]] core — this gate, [[CropStream]], and
  * [[OrientStream]] differ only in the hasher and the family column.
  */
object RotCropStream {

  /** Parquet schema of the asset feed as stored. */
  val storedSchema: StructType = FamilyStream.storedSchema

  /** File-based stream over a directory of asset parquet. */
  def read(spark: SparkSession, dir: String): DataFrame =
    FamilyStream.read(spark, dir)

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

  /** One micro-batch (exposed for direct testing — semantics are
    * batch-deterministic, the stream only schedules it).
    */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      indexDir: String, quarantineDir: String, maxHamming: Int): Unit =
    FamilyStream.ingestBatch(batch, batchId, indexDir, quarantineDir,
      maxHamming, familyCol = "fam", familySigs = b => {
        import b.sparkSession.implicits._
        Multimodal.rotCropDHashStatus(b.as[Multimodal.Asset]).toDF()
          .select(col("asset_id").as("id"), col("fam"),
            col("dhash").as("sig"))
      })
}
