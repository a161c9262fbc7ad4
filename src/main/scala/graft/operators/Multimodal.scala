package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side shape is the real part — schema, partition-preserving
  * batched iteration (`mapPartitions` over a typed Dataset), stable UDF
  * signatures — while the actual codec call is a STUB: this container
  * has no image/audio libraries, so `decodeStub` derives deterministic
  * fake metadata/features from the bytes. In production the stub body is
  * replaced by the native decoder (e.g. libjpeg/ffmpeg via JNI) without
  * touching any of the distributed plumbing; partitions arrive as
  * iterators, so a per-partition codec context amortizes initialization
  * exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  case class Asset(asset_id: Long, media_type: String, media: Array[Byte])
  case class DecodedAsset(asset_id: Long, media_type: String, byte_size: Long,
      width: Int, height: Int, duration_ms: Long, checksum: Long)
  case class AssetFeatures(asset_id: Long, features: Array[Float])
  case class Frame(asset_id: Long, frame_index: Int, offset_ms: Long,
      frame: Array[Byte])

  /** ======= STUB ======= deterministic fake "decode" of a media header:
    * real implementation parses the container format. Everything derived
    * purely from the bytes so tests are reproducible.
    */
  private def decodeStub(a: Asset): DecodedAsset = {
    val sum = a.media.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
    DecodedAsset(a.asset_id, a.media_type, a.media.length.toLong,
      width = 16 + (math.abs(sum) % 1920).toInt,
      height = 16 + (math.abs(sum / 7) % 1080).toInt,
      duration_ms = if (a.media_type == "image") 0L else math.abs(sum) % 600000L,
      checksum = sum)
  }

  /** Decode metadata for every asset — batched per partition; the codec
    * context would be allocated once per partition here.
    */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition codec init goes here (STUB: none needed)
      batch.map(decodeStub)
    }
  }

  /** ======= STUB ======= fixed-width feature vector from media bytes
    * (real implementation runs the vision/audio encoder on the decoded
    * frames). Deterministic: dim i = hash of (checksum, i) scaled to
    * [-1, 1).
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val sum = a.media.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        val fs = Array.tabulate(dim) { i =>
          val h = java.util.Objects.hash(java.lang.Long.valueOf(sum),
            java.lang.Integer.valueOf(i)).toLong
          ((h % 1000003L) / 1000003.0f) * 2f - 1f
        }
        AssetFeatures(a.asset_id, fs)
      }
    }
  }

  case class ResizedAsset(asset_id: Long, media_type: String,
      width: Int, height: Int, media: Array[Byte])

  /** ======= STUB ======= resize an image asset to fit within
    * (maxW, maxH) preserving aspect ratio (real implementation decodes,
    * scales, re-encodes). The stub derives source dims like decodeStub
    * and emits a deterministic payload of the target size's byte count
    * scaled DOWN from the source bytes — so downstream operators see
    * realistic shrunk payloads and the partition-preserving batched
    * iteration (per-partition scaler context) is exercised for real.
    */
  def resize(assets: Dataset[Asset], maxW: Int = 256,
      maxH: Int = 256): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition scaler context goes here (STUB: none needed)
      batch.filter(_.media_type == "image").map { a =>
        val d = decodeStub(a)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
        val (w, h) = (math.max(1, (d.width * scale).toInt),
          math.max(1, (d.height * scale).toInt))
        val outLen = math.max(1,
          (a.media.length * (w.toLong * h) / (d.width.toLong * d.height)).toInt)
        ResizedAsset(a.asset_id, a.media_type, w, h, a.media.take(outLen))
      }
    }
  }

  /** ======= STUB ======= sample up to `n` evenly-spaced frames from a
    * video asset (real implementation seeks the container). Emitted rows
    * carry slices of the source bytes as stand-in frame payloads.
    */
  def sampleFrames(assets: Dataset[Asset], n: Int = 4): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val len = a.media.length
      val take = math.min(n, math.max(len, 1))
      (0 until take).map { i =>
        val off = (len.toLong * i) / take
        Frame(a.asset_id, i, off * 40L,
          a.media.slice(off.toInt, math.min(len, off.toInt + 16)))
      }
    }
  }

  /** Chunk-fingerprint "document" for a media payload: the raw bytes are
    * cut into fixed `chunkBytes`-sized chunks, each chunk fingerprinted
    * with md5 directly on the binary slice, fingerprints space-joined —
    * an opaque binary column becomes a token sequence the text near-dup
    * operators (MinHash+LSH, exact Jaccard, SimHash) consume unchanged.
    * This is the standard shape for media dedup at scale: after this
    * projection only 32-char fingerprints shuffle (~32 B per KiB of
    * media, a ~97% reduction) and payload bytes never leave their scan
    * partition.
    *
    * Chunking works on the BINARY column, never a hex projection: a
    * hex-string intermediate referenced inside the transform lambda gets
    * inlined by projection collapse and recomputed per chunk — measured
    * ~100× slower on the 128 MB fixture (per-row garbage of chunks ×
    * payload). Binary substring is an O(1)-offset slice. The DuckDB
    * oracle still replays chunking in the hex domain (hex() is the
    * shared accessor, md5(hex chunk) there vs md5(byte chunk) here):
    * the md5 VALUES differ across engines but the equality structure —
    * which is all Jaccard sees — is identical, so near-dup output
    * matches exactly.
    */
  def chunkFingerprintDoc(binCol: Column, chunkBytes: Int): Column = {
    val n = floor((length(binCol) + lit(chunkBytes - 1)) /
      lit(chunkBytes)).cast("int")
    when(length(binCol) === 0, lit(""))
      .otherwise(array_join(
        transform(sequence(lit(0), greatest(n - lit(1), lit(0))),
          i => md5(binCol.substr(i * lit(chunkBytes) + lit(1), lit(chunkBytes)))),
        " "))
  }

  /** Build an asset table from the documents corpus (text bytes stand in
    * for media payloads; media_type assigned deterministically) — the
    * plumbing input used by tests and benchmarks.
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        to_binary(col("text"), lit("utf-8")).as("media"))
      .as[Asset]
  }
}
