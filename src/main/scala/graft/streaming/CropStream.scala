package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Multimodal}

/** Streaming ingest of an IMAGE feed with CROP-ROBUST perceptual dedup
  * — the m17 operator at the stream gate (round 14, extending the
  * modality gates to the edit class [[MediaStream]]'s single-hash gate
  * is structurally blind to): per micro-batch, decode every arriving
  * image and hash its overlapping multi-scale REGION-WINDOW family
  * ([[Multimodal.regionDHash]] — R=7 windows, 8 B each), collapse
  * within-batch crop relations to cluster canonicals, check survivors
  * against the accumulated at-rest REGION-FINGERPRINT index with the
  * cross-corpus region banding ([[Dedup.regionNearDupsSigCross]] —
  * index×batch candidates on (band, block) WITHOUT the region id, so a
  * crop's full window collides with the original's matching
  * sub-window; verified by the MINIMUM over the region cross product),
  * append novel region sets and quarantine duplicate arrivals with
  * their best match. A cropped repost of an already-indexed picture —
  * the most common image near-dup class in web corpora, invisible to
  * both the byte gate and the whole-image dHash gate — is caught here
  * at distance 0 when the crop sits on the window grid, and
  * approximately near it off-grid (PerceptualDedupSpec measures the
  * degradation).
  *
  * State posture at scale: no in-stream image state — the index holds
  * (id, region, 8-byte hash, byte size) rows in parquet (R rows per
  * image, the VideoStream k-slot shape), media bytes never leave their
  * batch's scan, and each batch pays one decode pass plus the banded
  * equi-join against the index. Undecodable payloads are quarantined
  * loudly as 'undecodable'; payloads that decode but are too small for
  * any family window carry their own 'too_small' reason (ADVICE r14 —
  * neither is indexed). Exactly-once effect without a transactional
  * sink: both
  * writes are partitioned by micro-batch id under dynamic partition
  * overwrite with the batch's own partition excluded from the index
  * view (the DocStream rule).
  */
object CropStream {

  /** Parquet schema of the asset feed as stored. */
  val storedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("media_type", StringType),
    StructField("media", BinaryType)))

  /** File-based stream over a directory of asset parquet; event time
    * MONOTONE in the id (the DocStream/MediaStream rule).
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

  /** One micro-batch (exposed for direct testing — semantics are
    * batch-deterministic, the stream only schedules it).
    */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      indexDir: String, quarantineDir: String, maxHamming: Int): Unit = {
    import graft.Graft
    import org.apache.spark.storage.StorageLevel
    val s = batch.sparkSession
    if (batch.isEmpty) return
    import s.implicits._
    Graft.cacheScope {
      // ONE decode pass: (id, region, sig) for decodable images — R
      // 8-byte rows per image, plus the region = -1 sentinel for
      // decoded-but-sub-grid pictures (ADVICE r14: a tiny image is
      // 'too_small', not 'undecodable'); the media column is dropped
      // right here
      val allSigs = Graft.trackedPersist(
        Multimodal.regionDHashStatus(
          batch.select("asset_id", "media_type", "media")
            .as[Multimodal.Asset]).toDF()
          .select(col("asset_id").as("id"), col("region"),
            col("dhash").as("sig")),
        StorageLevel.MEMORY_AND_DISK)
      val sigs = allSigs.filter(col("region") >= 0)
      val sizes = Graft.trackedPersist(
        batch.select(col("asset_id").as("id"),
          length(col("media")).cast("long").as("byte_size")),
        StorageLevel.MEMORY_AND_DISK)
      val decodedIds = sigs.select("id").distinct()
      def unmatched(reason: String, ids: DataFrame): DataFrame =
        ids.select(col("id").as("asset_id"),
          lit(null).cast("long").as("matched_id"),
          lit(null).cast("long").as("hamming"),
          lit(reason).as("reason"))
      // decoded fine but every family window is sub-grid: quarantined
      // with its own reason — such assets are never indexed (their
      // fingerprint would be degenerate), but the label says why
      val tooSmall = unmatched("too_small",
        allSigs.filter(col("region") === -1).select("id"))
      val undecodable = unmatched("undecodable",
        sizes.select("id")
          .join(allSigs.select("id").distinct(), Seq("id"), "left_anti"))
      // within-batch crop clusters → canonical survivors
      val pairs = Dedup.regionNearDupsSig(sigs.select("id", "sig"),
          maxHamming, bands = 8)
        .select(col("id1"), col("id2"))
      val clusters = Dedup.dupClusters(pairs)
      val survivorIds = Dedup.keepCanonical(decodedIds, "id", clusters)
      val survivorSigs = sigs.join(survivorIds, Seq("id"))
      val localDropped = clusters
        .filter(col("canonical_id") =!= col("member_id"))
        .select(col("member_id").as("asset_id"),
          col("canonical_id").as("matched_id"),
          lit(0L).as("hamming"), // within-batch: clustered, not scored
          lit("within_batch").as("reason"))
      // replay safety: exclude THIS batch's partition from the index
      val (novelIds, crossDropped) = existingIndex(s, indexDir)
          .map(_.filter(col("ingest_batch") =!= lit(batchId))) match {
        case Some(idx) =>
          val cross = Dedup.regionNearDupsSigCross(
            idx.select(col("asset_id").as("id"), col("dhash").as("sig")),
            survivorSigs.select("id", "sig"), maxHamming, bands = 8)
          val dropped = cross.groupBy(col("batch_id").as("asset_id"))
            .agg(min_by(col("index_id"),
                struct(col("min_hamming"), col("index_id"))).as("matched_id"),
              min(col("min_hamming")).cast("long").as("hamming"))
            .withColumn("reason", lit("index_near_dup"))
          (survivorIds.join(dropped.select(col("asset_id").as("id")),
            Seq("id"), "left_anti"), dropped)
        case None =>
          (survivorIds, s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            localDropped.schema))
      }
      val novelT = Graft.truncate(
        sigs.join(novelIds, Seq("id"))
          .join(sizes, Seq("id"))
          .select(col("id").as("asset_id"), col("region"),
            col("sig").as("dhash"), col("byte_size"))
          .withColumn("ingest_batch", lit(batchId)), eager = true)
      val quarT = Graft.truncate(
        localDropped.unionByName(crossDropped).unionByName(tooSmall)
          .unionByName(undecodable)
          .withColumn("ingest_batch", lit(batchId)), eager = true)
      try {
        novelT.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch").parquet(indexDir)
        quarT.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch").parquet(quarantineDir)
      } finally {
        Graft.releaseTruncated(novelT)
        Graft.releaseTruncated(quarT)
        Graft.releaseTruncated(clusters)
      }
    }
  }

  private def existingIndex(s: SparkSession,
      dir: String): Option[DataFrame] =
    try {
      val df = s.read.parquet(dir)
      if (df.columns.contains("dhash") && df.columns.contains("region"))
        Some(df)
      else None
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }
}
