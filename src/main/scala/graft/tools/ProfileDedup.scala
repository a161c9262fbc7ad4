package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Graft
import graft.functions.Text
import graft.operators.Dedup

/** Stage-by-stage profiler for the dedup/similarity hot paths — counts
  * and wall-clock per intermediate, to find where candidate volume or
  * recomputation blows up. Not part of the engine surface.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 1
    val spark = Graft.session()
    import spark.implicits._

    // stage-level ground truth: print every completed stage's wall time
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        if (dur.exists(_ > 2.0))
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"${dur.getOrElse(0.0)}%7.1f s  ${si.name.takeWhile(_ != '\n').take(90)}")
      }
    })

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    val docs =
      if (mult == 1) Graft.table(spark, sfDir, "documents")
      else {
        val d = ScaleStress.corpus(spark, sfDir, mult)
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count()
        d
      }

    // ---- x7 minhash stages ----
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 32, shingleSize = 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("sigs.count")(sigs.count())
    val k = 32; val bands = 16; val rowsPerBand = k / bands
    val banded = sigs.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
      .as(Seq("band", "bucket")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("banded.count")(banded.count())
    t("max bucket size")(
      banded.groupBy("band", "bucket").count().agg(max("count")).first().getLong(0))
    t("buckets > 256")(
      banded.groupBy("band", "bucket").count().filter(col("count") > 256).count())
    val capped = banded.groupBy("band", "bucket").agg(count(lit(1)).as("__c"))
      .filter(col("__c") <= 256).drop("__c")
    val bounded = banded.join(capped, Seq("band", "bucket"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("bounded.count")(bounded.count())
    val l = bounded.as("l"); val r = bounded.as("r")
    val rawPairs = l.join(r, col("l.band") === col("r.band") &&
      col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
    t("rawPairs.count")(rawPairs.count())
    val cands = rawPairs.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    t("cands.count")(cands.count())
    val estimated = cands
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est", Text.minhashEstimate(col("sig1"), col("sig2"), k))
      .filter(col("est") >= 0.25)
    t("estimated.count")(estimated.count())
    t("x7 full")(Dedup.minhashNearDups(docs, "doc_id", "text",
      k = 32, bands = 16, shingleSize = 3, threshold = 0.5).count())

    // ---- x8 simhash stages ----
    val ssigs = docs.select(col("doc_id").as("id"),
      Text.simhash64(col("text")).as("sig")).persist(StorageLevel.MEMORY_AND_DISK)
    t("simhash sigs.count")(ssigs.count())
    val sbanded = ssigs.select(col("id"), col("sig"), posexplode(
      transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sig"), b.cast("int") * 16)
          .bitwiseAND(lit(0xFFFFL))))
      .as(Seq("band", "block")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("simhash banded.count")(sbanded.count())
    t("simhash max block size")(
      sbanded.groupBy("band", "block").count().agg(max("count")).first().getLong(0))
    t("simhash blocks > 256")(
      sbanded.groupBy("band", "block").count().filter(col("count") > 256).count())
    val scapped = sbanded.groupBy("band", "block").agg(count(lit(1)).as("__c"))
      .filter(col("__c") <= 256).drop("__c")
    val sbounded = sbanded.join(scapped, Seq("band", "block"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("simhash bounded.count")(sbounded.count())
    val sl = sbounded.as("l"); val sr = sbounded.as("r")
    val sraw = sl.join(sr, col("l.band") === col("r.band") &&
      col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        Text.hamming64(col("l.sig"), col("r.sig")).as("hamming"))
    t("simhash rawPairs.count")(sraw.count())
    t("simhash distinct.count")(sraw.distinct().count())
    t("simhash final <=16")(sraw.distinct().filter(col("hamming") <= 16).count())
    t("x8 full")(Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 16).count())

    // ---- x6 exact jaccard stages ----
    val sets = docs.select(col("doc_id").as("id"),
      explode(array_distinct(Text.wordShingles(col("text"), 3))).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("x6 sets.count")(sets.count())
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("sz"))
    val xl = sets.as("l"); val xr = sets.as("r")
    val common = xl.join(xr, col("l.sh") === col("r.sh") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id1"), col("r.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    t("x6 common.count")(common.count())
    t("x6 full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1).count())

    spark.stop()
  }
}
