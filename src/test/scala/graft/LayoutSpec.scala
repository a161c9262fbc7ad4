package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** Data layout at rest = the scan-reduction lever pushdown can only
  * exploit if the writer cooperated: `Sinks.writeRangeSorted` produces
  * narrow, disjoint row-group min/max stats on the sort key, so a pushed
  * range predicate skips whole row groups. The same data written in hash
  * order has every row group spanning the full key domain — nothing
  * skips. This spec measures the scan metric on identical data.
  */
class LayoutSpec extends SparkSpec {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-sorted layout skips row groups; hash layout cannot") {
    val dir = "/root/testdata/sf0.01"
    val sortedPath = "/tmp/graft_layout/sorted"
    val hashedPath = "/tmp/graft_layout/hashed"
    // small row groups so the sf0.01 table produces many of them
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 128 * 1024)
    try {
      // NOTE: the sort key is a bigint deliberately — on this Spark
      // build parquet row-group skipping works for INT32/INT64/string
      // stats but NOT for timestamp(_ntz) columns (filter is pushed,
      // stats are written, never used to prune; see verify skill
      // gotchas). At rest, sort on integral surrogate keys or epoch
      // columns if scans filter on time.
      val li = Graft.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice")
      Sinks.writeRangeSorted(li, sortedPath, Seq("l_orderkey"), numFiles = 4)
      li.repartition(4).write.mode("overwrite").parquet(hashedPath)

      def narrowScan(path: String): DataFrame =
        spark.read.parquet(path)
          .filter(col("l_orderkey").between(1000L, 2000L))

      val matching = narrowScan(sortedPath).count()
      val total = li.count()
      assert(matching > 0 && matching < total / 10,
        s"fixture assumption: narrow slice ($matching of $total)")

      val sortedRead = scanRows(narrowScan(sortedPath))
      val hashedRead = scanRows(narrowScan(hashedPath))
      // hash layout decodes (nearly) everything; sorted layout only the
      // row groups whose min/max overlap the key range
      assert(hashedRead > (total * 9) / 10,
        s"hashed layout should read ~all rows, read $hashedRead of $total")
      assert(sortedRead < hashedRead / 4,
        s"sorted layout should skip most row groups: sorted=$sortedRead hashed=$hashedRead")
      // both layouts return identical results
      assert(sortedRead >= matching)
    } finally {
      spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
    }
  }

  test("p14 declares the skip: memo records rows-read well under rows-total") {
    val dir = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("p14_layout_range_skip")(spark, dir)
    assert(df.count() > 0, "narrow range must be non-empty")
    val stats = graft.queries.Core.layoutSkip.get(dir)
    assert(stats != null, "the layout memo must record its measured skip")
    val (read, total) = stats
    assert(read > 0 && total > 0)
    // 8 range-partitioned files: the 1000..2000 slice lives in one of
    // them, so the pushed BETWEEN must decode well under half the table
    assert(read.toDouble / total < 0.5,
      s"range-sorted layout should skip most rows: read=$read total=$total")
  }
}
