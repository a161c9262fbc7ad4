package graft.pipelines

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ≥100 MB binary-asset fixture for the multimodal surface: opaque
  * media payloads (deterministic LCG bytes — incompressible, like real
  * encoded media) + typed metadata, written with explicit row-group
  * sizing so the binary column chunks are scan-friendly.
  *
  * Generated DISTRIBUTED (range → mapPartitions), never on the driver:
  * the same code path writes 100 TB of assets on a cluster.
  */
object MultimodalFixture {

  val root: String =
    sys.env.getOrElse("SPARK_GRAFT_MM_DIR", "/root/repo/data/mm")
  def assetsPath: String = s"$root/assets.parquet"

  val nAssets = 2000

  /** Payload length for an asset id: 32 KiB + id-keyed spread up to
    * 96 KiB (avg ~64 KiB → ~128 MB total). Pure arithmetic so tests can
    * recompute expected totals without materializing payloads.
    */
  def payloadLen(id: Long): Int =
    32768 + (((mix(id) >>> 17) % 65536L).toInt)

  private def mix(id: Long): Long = {
    var x = id * 6364136223846793005L + 1442695040888963407L
    x ^= (x >>> 33); x *= -49064778989728563L; x ^= (x >>> 29) // Stafford mix
    x
  }

  /** Deterministic payload bytes for an asset. */
  def payload(id: Long): Array[Byte] = {
    val n = payloadLen(id)
    val out = new Array[Byte](n)
    var s = mix(id ^ 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  @volatile private var ready = false

  def ensure(spark: SparkSession): Unit = if (!ready) synchronized {
    if (ready) return
    if (!new File(s"$assetsPath/_SUCCESS").exists()) build(spark)
    ready = true
  }

  def build(spark: SparkSession): Unit = {
    import spark.implicits._
    graft.Graft.tune(spark)
    val assets = spark.range(0, nAssets.toLong, 1, 16).map { id =>
      graft.operators.Multimodal.Asset(id,
        Seq("image", "audio", "video")((id % 3).toInt), payload(id))
    }
    // 8 files ≈ 16 MB each; 32 MB row groups keep one group per file —
    // at 100 TB the same block size gives ~3 groups per 128 MB split, so
    // a binary column chunk never straddles a task boundary.
    assets.toDF("asset_id", "media_type", "media")
      .repartition(8)
      .write.mode("overwrite")
      .option("parquet.block.size", (32 * 1024 * 1024).toString)
      .parquet(assetsPath)
  }
}
