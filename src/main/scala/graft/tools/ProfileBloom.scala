package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.Text
import graft.operators.Dedup

/** A/B the Bloom-prefiltered incremental dedup (x29's operator) against
  * the plain anti-join on a real corpus, interleaved in one JVM (the
  * ProfileCap pattern — comparable under roaming external load).
  * Reports the routing split: rows that bypass the verify join entirely
  * (the sketch's scale win — those full-width rows never shuffle) vs
  * might-contain candidates, alongside the true-dup count.
  *
  *   runMain graft.tools.ProfileBloom [sfDir] [passes]
  */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = Graft.session()
    val docs = Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val half = docs.agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY doc_id)"))
      .head.getDouble(0).toLong
    // index = older half; batch = newer half + 10% re-crawls of the index
    val index = docs.filter(col("doc_id") <= half)
      .select(Text.fingerprint(col("text")).as("f"))
    val batchBase = docs.filter(col("doc_id") > half)
    val recrawl = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") <= half)
      .withColumn("doc_id", col("doc_id") + 10000000L)
    val batch = batchBase.unionAll(recrawl)
      .withColumn("f", Text.fingerprint(col("text")))
      .persist()
    val idx = index.persist()
    println(s"[bloom] index=${idx.count()} batch=${batch.count()}")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (p <- 1 to passes) {
      val (nPlain, tPlain) = time(
        batch.join(idx.distinct(), Seq("f"), "left_anti").count())
      val (nBloom, tBloom) = time(
        Dedup.incrementalNewRows(idx, batch, "f",
          expectedItems = 1000000L, fpp = 0.03).count())
      println(f"[bloom] pass $p plain=$tPlain%.2fs bloom=$tBloom%.2fs " +
        f"new_plain=$nPlain new_bloom=$nBloom")
      assert(nPlain == nBloom, "bloom path diverged from the anti-join")
    }
    // routing split at fpp 0.03 (one extra sketch build, measured above)
    val keys = idx.select(xxhash64(col("f")).as("__k"))
    val sketch = keys.stat.bloomFilter("__k", 1000000L, 0.03)
    val bytes = { val b = new java.io.ByteArrayOutputStream()
      sketch.writeTo(b); b.toByteArray }
    val maybe = org.apache.spark.sql.GraftColumnBridge
      .mightContainLong(bytes, xxhash64(col("f")))
    val nBatch = batch.count()
    val nCand = batch.filter(maybe).count()
    println(f"[bloom] sketch=${bytes.length / 1024} KiB candidates=$nCand " +
      f"of $nBatch (${100.0 * nCand / nBatch}%.1f%% shuffle; " +
      f"${100.0 - 100.0 * nCand / nBatch}%.1f%% bypass)")
    spark.stop()
  }
}
