package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting = the explicit skew defense: identical results to the plain
  * groupBy/join, but the hot key's state/rows spread over n sub-keys.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key with 5000 rows + 200 uniform keys with 10 rows each;
  // values repeat so distinct-count differs from count.
  private lazy val skewed = {
    val hot = (1 to 5000).map(i => ("hot", s"v${i % 137}", i.toLong))
    val cold = for (k <- 1 to 200; i <- 1 to 10)
      yield (s"k$k", s"v${i % 7}", (k * 1000 + i).toLong)
    (hot ++ cold).toDF("key", "value", "id")
  }

  test("saltedDistinctCount equals plain countDistinct") {
    val expected = skewed.groupBy("key")
      .agg(count_distinct(col("value")).as("n_distinct"))
      .orderBy("key").collect().toSeq
    val got = Skew.saltedDistinctCount(skewed, "key", "value", nSalts = 8)
      .orderBy("key").collect().toSeq
    assert(got === expected)
  }

  test("saltedDistinctCount ignores null values like COUNT DISTINCT") {
    val df = Seq(("a", Some("x")), ("a", None), ("a", Some("x")),
      ("b", None)).toDF("key", "value")
    val got = Skew.saltedDistinctCount(df, "key", "value", nSalts = 4)
      .orderBy("key").collect().toSeq
    assert(got === Seq(Row("a", 1L), Row("b", 0L)))
  }

  test("saltedJoin equals plain join (inner and left), hot key included") {
    val dim = Seq(("hot", 99), ("k1", 1), ("k2", 2), ("unmatched", 0))
      .toDF("key", "rank")
    val plainInner = skewed.join(dim, Seq("key"), "inner")
      .orderBy("id").collect().toSeq
    val saltedInner = Skew.saltedJoin(skewed, dim, "key", Seq("id"), 8)
      .orderBy("id").collect().toSeq
    assert(saltedInner === plainInner)

    // left join: big rows with no dim match survive exactly once
    val small = dim.filter(col("key") =!= "hot")
    val plainLeft = skewed.join(small, Seq("key"), "left")
      .orderBy("id").collect().toSeq
    val saltedLeft =
      Skew.saltedJoin(skewed, small, "key", Seq("id"), 8, "left")
        .orderBy("id").collect().toSeq
    assert(saltedLeft === plainLeft)
  }

  test("saltedJoin rejects right/full join types") {
    val dim = Seq(("hot", 1)).toDF("key", "rank")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "key", Seq("id"), 8, "right")
    }
  }

  test("salted join shuffles on (key, salt), not key alone") {
    val dim = Seq(("hot", 99), ("k1", 1)).toDF("key", "rank")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Skew.saltedJoin(skewed, dim, "key", Seq("id"), 8)
      // before execution the physical plan's exchanges must carry the
      // salt in their hash partitioning — that IS the skew spread
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.outputPartitioning.toString
      }
      assert(exchanges.nonEmpty)
      assert(exchanges.forall(_.contains("__salt")),
        s"join exchanges must partition by (key, __salt): $exchanges")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("distributed prefix sum equals the single-window form") {
    // sparse, non-contiguous ids; a tiny blockSpan forces MANY blocks so
    // the offset carry between blocks is actually exercised
    val rows = (1 to 997).map(i =>
      (s"s${i % 3}", i.toLong * 7 + (i % 5), (i % 23 + 1).toLong))
      .toDF("source", "doc_id", "n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val single = rows
      .withColumn("start", coalesce(sum(col("n")).over(w), lit(0L)))
      .select("source", "doc_id", "start")
    val dist = graft.operators.PrefixSum
      .exclusive(rows, "source", "doc_id", "n", blockSpan = 64L)
      .select("source", "doc_id", "start")
    assert(dist.exceptAll(single).isEmpty && single.exceptAll(dist).isEmpty)
    // local window partitions are bounded by the block, not the group:
    // every (source, block) slice holds at most blockSpan distinct ids
    val worst = dist.withColumn("blk", (col("doc_id") / 64L).cast("long"))
      .groupBy("source", "blk").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(worst <= 64L)
  }
}
