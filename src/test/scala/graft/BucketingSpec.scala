package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: tables written `bucketBy(n, key)` are
  * already hash-partitioned on disk, so an equi-join on the bucket key
  * needs NO exchange on either side — the co-located-join shape the
  * 100 TB posture calls for when the same fact table is joined on the
  * same key repeatedly (each query re-reads buckets instead of
  * re-shuffling the corpus).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed equi-join plans with zero Exchange on either side") {
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Graft.table(spark, dir, "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      Graft.table(spark, dir, "customer")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

      // the aggregation itself still exchanges on its (different) key;
      // the JOIN subtree must not — walk the plan below the join
      val plan = j.queryExecution.executedPlan match {
        // AdaptiveSparkPlanExec is a collect() leaf — unwrap to its
        // current physical plan so the traversal sees the join subtree
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val joinNode = plan.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }
      assert(joinNode.nonEmpty, s"expected SortMergeJoin, got:\n$plan")
      val exchangesBelowJoin = joinNode.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchangesBelowJoin.isEmpty,
        s"bucketed join must not shuffle either side:\n${joinNode.head}")

      // and the result is the unbucketed answer
      val expected = Graft.table(spark, dir, "orders")
        .join(Graft.table(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(j.orderBy("c_mktsegment").collect().toSeq ==
        expected.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("p17 declared query: SMJ with zero shuffle below the join, rows match the unbucketed join") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("p17_bucketed_join_zero_shuffle")(spark, dir)
    val got = df.collect().toSeq
    // plan guard on the DECLARED frame itself (not just the memo's
    // evidence run): the merge hint pins SMJ, the bucketed scans feed it
    // with no exchange on either side
    val smj = graft.queries.Core.flatPlan(df.queryExecution.executedPlan)
      .collectFirst {
        case m: org.apache.spark.sql.execution.joins.SortMergeJoinExec => m
      }
    assert(smj.nonEmpty, s"expected SortMergeJoin:\n${df.queryExecution.executedPlan}")
    val exchanges = graft.queries.Core.flatPlan(smj.get).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed declared join must not shuffle either side:\n${smj.get}")
    // the memo's evidence run recorded the same zero-exchange shape
    val ev = graft.queries.Core.bucketJoin.get(dir)
    assert(ev != null && ev._1 == 0L && ev._2 > 0L,
      s"bucketJoin evidence should record (0 exchanges, >0 rows), got $ev")
    // identical rows to the unbucketed join
    val expected = Graft.table(spark, dir, "lineitem")
      .join(Graft.table(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(got == expected)
  }

  test("bucketed layout at rest: a fresh session re-registers the frozen files and keeps the zero-shuffle join") {
    val dir = "/root/testdata/sf0.001"
    // first resolution writes (or reloads) the bucketed copies and
    // stamps them with the source fingerprint
    SparkEntry.queries("p17_bucketed_join_zero_shuffle")(spark, dir)
      .collect()
    RestMemo.drainOutcomes()
    // a NEW session gets its own SessionMemo slots, so the memo
    // recomputes; the copy markers match, so it must take the
    // RE-REGISTRATION path (DDL over the existing file sets — the
    // round-13 per-session rebuild gap) and the evidence join must
    // still prove zero shuffle below the SMJ
    val s2 = spark.newSession()
    Graft.tune(s2)
    val got = SparkEntry.queries("p17_bucketed_join_zero_shuffle")(s2, dir)
      .orderBy("o_orderpriority").collect().toSeq
    val outcomes = RestMemo.drainOutcomes()
    assert(outcomes.get("layout-bucketed-v1").contains("reloaded"),
      s"second session should reload, recorded: $outcomes")
    val ev = graft.queries.Core.bucketJoin.get(dir)
    assert(ev != null && ev._1 == 0L && ev._2 > 0L,
      s"re-registered bucketed join lost the zero-shuffle evidence: $ev")
    // and the rows are still the unbucketed answer
    val expected = Graft.table(s2, dir, "lineitem")
      .join(Graft.table(s2, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(got == expected)
  }
}
