package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — Spark's third scan-reduction lever
  * after static pushdown and partition pruning: a selective filter on
  * the dimension side of a shuffle join is turned into a bloom filter
  * that prunes fact rows BEFORE they shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling only
  * the ~matching fraction. The thresholds here only shrink the
  * "worth it" size gates so the sf0.001 tables qualify; the rewrite
  * itself is the stock InjectRuntimeFilter rule.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects might_contain into the fact side") {
    val dir = "/root/testdata/sf0.001"
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevScanThresh = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Graft.table(spark, dir, "lineitem")
      val ord = Graft.table(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected a bloom runtime filter on the fact side:\n$opt")

      // and the result with the filter active matches the plain join
      val got = j.collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty")).collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevScanThresh)
    }
  }
}
