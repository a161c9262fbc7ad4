package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** Z-order layout = multi-column data skipping: a linear sort serves
  * only its leading column's filters; the Morton curve clusters BOTH
  * dimensions so row-group min/max prune on either. Measured via the
  * same scan metric as LayoutSpec on identical data.
  */
class ZOrderSpec extends SparkSpec {

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

  test("z-order prunes on BOTH columns; linear sort only on its leading one") {
    val dir = "/root/testdata/sf0.01"
    val base = "/tmp/graft_zorder"
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 128 * 1024)
    try {
      val li = Graft.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
      val Array(row) = li.agg(max("l_orderkey"), max("l_partkey")).collect()
      val (maxOrder, maxPart) = (row.getLong(0).toDouble, row.getLong(1).toDouble)

      val z = Sinks.zValue(
        Sinks.quantize(col("l_orderkey"), 0, maxOrder, 12),
        Sinks.quantize(col("l_partkey"), 0, maxPart, 12), 12)
      Sinks.writeZOrdered(li, s"$base/z", z, numFiles = 4)
      Sinks.writeRangeSorted(li, s"$base/linear", Seq("l_orderkey"), numFiles = 4)

      val total = li.count()
      def orderFilter(path: String) = spark.read.parquet(path)
        .filter(col("l_orderkey").between(lit(0L), lit((maxOrder * 0.05).toLong)))
      def partFilter(path: String) = spark.read.parquet(path)
        .filter(col("l_partkey").between(lit(0L), lit((maxPart * 0.05).toLong)))

      // both slices are genuinely narrow
      assert(orderFilter(s"$base/z").count() < total / 10)
      assert(partFilter(s"$base/z").count() < total / 10)

      val zOrderScan = scanRows(orderFilter(s"$base/z"))
      val zPartScan = scanRows(partFilter(s"$base/z"))
      val linOrderScan = scanRows(orderFilter(s"$base/linear"))
      val linPartScan = scanRows(partFilter(s"$base/linear"))

      // linear layout: leading column prunes hard, the other reads ~all
      assert(linOrderScan < total / 4,
        s"linear layout should prune its sort column: $linOrderScan of $total")
      assert(linPartScan > (total * 9) / 10,
        s"linear layout cannot prune the non-sort column: $linPartScan of $total")
      // z-order: BOTH columns prune substantially
      assert(zOrderScan < total / 2,
        s"z-order should prune on l_orderkey: $zOrderScan of $total")
      assert(zPartScan < total / 2,
        s"z-order should prune on l_partkey: $zPartScan of $total")
    } finally {
      spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
    }
  }
}
