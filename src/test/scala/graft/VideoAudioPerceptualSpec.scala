package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.pipelines.MultimodalFixture
import graft.sources.MediaBinary

/** The perceptual VIDEO and AUDIO near-dup contracts (m14/m15 — the
  * rungs that close the image/video/audio modality matrix):
  *
  *   - a cross-CODEC video pair (the same frames as uncompressed-DIB
  *     vs MJPEG) and a cross-RESOLUTION pair (2× downscale) share ZERO
  *     byte chunks — the m4 chunk pipeline provably misses every one —
  *     while the temporal frame-dHash signature stays within a small
  *     per-slot radius;
  *   - the measured separation the m14 oracle's planted-ground-truth
  *     arm rests on is PINNED here: planted pairs' worst sampled slot
  *     ≤ 8 bits, closest unrelated pair ≥ 25 — so radius 15 splits
  *     with margin on both sides, and any codec/hash change that
  *     erodes the split fails loudly in `sbt test` before the oracle;
  *   - a gain-halved or requantized audio twin shares zero bytes with
  *     its base while the 65-window amplitude-delta sign hash is
  *     bit-identical (measured distance 0), and unrelated audio sits
  *     ≥ 22 bits away;
  *   - the declared m14/m15 queries find exactly the planted pairs
  *     through the banded machinery.
  */
class VideoAudioPerceptualSpec extends SparkSpec {

  private def chunkMd5s(bytes: Array[Byte], ch: Int = 1024): Set[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until (bytes.length + ch - 1) / ch).map { i =>
      val end = math.min(bytes.length, (i + 1) * ch)
      md.reset()
      md.digest(java.util.Arrays.copyOfRange(bytes, i * ch, end))
        .map("%02x".format(_)).mkString
    }.toSet
  }

  private def frameHashes(bytes: Array[Byte], k: Int = 4): Seq[Long] = {
    val m = MediaBinary.decodeAviMeta(bytes).get
    val take = math.min(k, m.nFrames)
    (0 until take).map { i =>
      val idx = (m.nFrames.toLong * i / take).toInt
      Multimodal.dHash64(m.width, m.height,
        MediaBinary.aviFramePixels(bytes, m, idx))
    }
  }

  private def worstSlot(a: Seq[Long], b: Seq[Long]): Int = {
    require(a.size == b.size)
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.max
  }

  test("video cross-codec + cross-resolution twins: zero shared byte chunks, tiny temporal distance") {
    for (i <- Seq(0L, 3L, 6L, 11L)) {
      val dib = MultimodalFixture.vpercDibMedia(i)
      val down = MultimodalFixture.vpercDownMedia(i)
      val mj = MultimodalFixture.mjpegMedia(i)
      // the byte domain m4 lives in sees nothing in common across any
      // planted lane pair...
      assert(chunkMd5s(dib).intersect(chunkMd5s(mj)).isEmpty,
        s"DIB/MJPEG encodings of clip $i should share no chunk md5s")
      assert(chunkMd5s(dib).intersect(chunkMd5s(down)).isEmpty,
        s"full/downscaled encodings of clip $i should share no chunk md5s")
      // ...while the temporal perceptual signature barely moves
      assert(worstSlot(frameHashes(dib), frameHashes(mj)) <= 8,
        s"cross-codec worst slot for clip $i exceeds the pinned bound")
      assert(worstSlot(frameHashes(dib), frameHashes(down)) <= 8,
        s"cross-resolution worst slot for clip $i exceeds the pinned bound")
    }
  }

  test("m14 separation envelope: planted worst slot <= 8, unrelated pairs >= 25 bits apart") {
    val n = MultimodalFixture.nMjpegs
    val lanes = Seq(
      (0 until n).map(i => frameHashes(MultimodalFixture.vpercDibMedia(i))),
      (0 until n).map(i => frameHashes(MultimodalFixture.vpercDownMedia(i))),
      (0 until n).map(i => frameHashes(MultimodalFixture.mjpegMedia(i))))
    var plantedMax = 0
    var unrelatedMin = Int.MaxValue
    for (la <- lanes.indices; lb <- lanes.indices; i <- 0 until n;
         j <- 0 until n
         if (la < lb || (la == lb && i < j)) &&
           lanes(la)(i).size == lanes(lb)(j).size) {
      val d = worstSlot(lanes(la)(i), lanes(lb)(j))
      if (la != lb && i == j) plantedMax = math.max(plantedMax, d)
      else unrelatedMin = math.min(unrelatedMin, d)
    }
    // radius 15 sits strictly inside [plantedMax, unrelatedMin): the
    // measured split the m14 oracle's MJPEG ground-truth arm rests on
    assert(plantedMax <= 8, s"planted worst slot grew to $plantedMax")
    assert(unrelatedMin >= 25, s"unrelated worst slot shrank to $unrelatedMin")
  }

  test("audio twins: zero shared bytes, identical sign hash; unrelated >= 22 bits") {
    import spark.implicits._
    def hash(bytes: Array[Byte]): Long = {
      val ds = Seq(Multimodal.Asset(0L, "audio", bytes)).toDS()
      Multimodal.audioDHash(ds).collect().head.dhash
    }
    val bases = MultimodalFixture.apercBaseIds.take(4)
    val hashes = bases.map { b =>
      val base = MultimodalFixture.media(b)
      val gain = MultimodalFixture.apercGainMedia(b)
      val quant = MultimodalFixture.apercQuantMedia(b)
      assert(chunkMd5s(base).intersect(chunkMd5s(gain)).isEmpty,
        s"gain twin of $b should share no chunks with its base")
      assert(chunkMd5s(base).intersect(chunkMd5s(quant)).isEmpty,
        s"quant twin of $b should share no chunks with its base")
      val (hb, hg, hq) = (hash(base), hash(gain), hash(quant))
      assert(hb == hg, s"gain twin of $b drifted the sign hash")
      assert(hb == hq, s"quant twin of $b drifted the sign hash")
      hb
    }
    for (Seq((a, ia), (b, ib)) <- hashes.zipWithIndex.combinations(2)) {
      val d = java.lang.Long.bitCount(a ^ b)
      assert(d >= 22, s"unrelated audio pair ($ia,$ib) only $d bits apart")
    }
  }

  test("m14 declared query: exactly the planted pairs per clip; m4's pipeline finds none") {
    val found = SparkEntry.queries("m14_video_perceptual_neardups")(spark, "")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = MultimodalFixture.nMjpegs.toLong
    val planted = (0L until n).flatMap { i =>
      Seq((MultimodalFixture.MjpegIdOffset + i, MultimodalFixture.VPercDibOffset + i),
        (MultimodalFixture.MjpegIdOffset + i, MultimodalFixture.VPercDownOffset + i),
        (MultimodalFixture.VPercDibOffset + i, MultimodalFixture.VPercDownOffset + i))
    }.toSet
    assert(planted.subsetOf(found),
      s"missing planted pairs: ${planted.diff(found).toSeq.sorted.take(5)}")
    assert(found == planted,
      s"unplanted pairs reported: ${found.diff(planted).toSeq.sorted.take(5)}")
    // the chunk-fingerprint pipeline over the SAME corpus reports no
    // planted pair — the gap m14 exists to close
    import spark.implicits._
    val corpus = spark.read.parquet(MultimodalFixture.vpercPath)
      .unionByName(spark.read.parquet(MultimodalFixture.mjpegPath))
      .select(col("asset_id").cast("long").as("doc_id"),
        Multimodal.chunkFingerprintDoc(col("media"), 1024).as("chunks"))
    val m4Style = Dedup.minhashNearDups(corpus, "doc_id", "chunks",
      k = 32, bands = 16, shingleSize = 1, threshold = 0.5)
    val cross = m4Style.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross.intersect(planted).isEmpty,
      s"byte-chunk dedup should miss every planted pair, found ${cross.intersect(planted)}")
  }

  test("m15 declared query: every twin pair found at distance 0") {
    val found = SparkEntry.queries("m15_audio_perceptual_neardups")(spark, "")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (b <- MultimodalFixture.apercBaseIds) {
      val g = b + MultimodalFixture.APercGainOffset
      val q = b + MultimodalFixture.APercQuantOffset
      for (pair <- Seq((b, g), (b, q), (g, q)))
        assert(found.get(pair).contains(0L),
          s"planted audio pair $pair missing or nonzero: ${found.get(pair)}")
    }
  }
}
