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

  test("zValue interleaves bits; quantize clamps to the bucket domain") {
    import spark.implicits._
    // a=5 (101), b=3 (011) → bits: a0@0,b0@1,a1@2,b1@3,a2@4,b2@5 = 011011 = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Sinks.zValue(col("a"), col("b"), 3).as("z"))
      .collect()(0).getLong(0)
    assert(z == 27L)
    val q = Seq((-5.0, 0.0, 1023.0, 2000.0)).toDF("lo", "zero", "hi", "over")
      .select(
        Sinks.quantize(col("lo"), 0, 1023, 10).as("lo"),
        Sinks.quantize(col("zero"), 0, 1023, 10).as("zero"),
        Sinks.quantize(col("hi"), 0, 1023, 10).as("hi"),
        Sinks.quantize(col("over"), 0, 1023, 10).as("over"))
      .collect()(0)
    assert(q.getLong(0) == 0L && q.getLong(1) == 0L)
    assert(q.getLong(2) == 1023L && q.getLong(3) == 1023L)
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

  test("p15 declares the z-skip: memo records rows-read well under rows-total") {
    val dir = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("p15_zorder_two_col_skip")(spark, dir)
    assert(df.count() > 0, "narrow partkey range must be non-empty")
    val stats = graft.queries.Core.layoutSkip.get(s"$dir zorder")
    assert(stats != null, "the z-layout memo must record its measured skip")
    val (read, total) = stats
    assert(read > 0 && total > 0)
    // the filter is on the SECOND z dimension — the one a linear
    // l_orderkey sort reads ~all rows for (the test above measures it)
    assert(read.toDouble / total < 0.5,
      s"z-order should skip most rows on l_partkey: read=$read total=$total")
  }
}
