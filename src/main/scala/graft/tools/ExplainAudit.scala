package graft.tools

import graft.{Graft, SparkEntry}

/** Dump formatted physical plans for representative queries — the
  * plan-quality audit loop: check predicate pushdown (PushedFilters),
  * column pruning (ReadSchema), broadcast joins, partial aggregation,
  * TakeOrderedAndProject, and WholeStageCodegen coverage.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.isEmpty)
      Seq("p1_filter_eq_project", "j1_broadcast_join", "j3_multiway_revenue",
        "a1_pricing_summary", "t3_top_customers", "w1_top1_per_nation",
        "x5_exact_dedup", "v2_cosine_topk")
    else args(0).split(",").toSeq
    val spark = Graft.session()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.all(n).fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
