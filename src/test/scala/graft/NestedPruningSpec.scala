package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipelines.OsmFixture

/** Nested-schema pruning: the shaped docs are WIDE (structs, maps,
  * arrays), but a query touching only `created.user` must read ONLY that
  * leaf from parquet — at 100 TB, reading the full `created` struct (or
  * the whole row) for a one-leaf projection multiplies scan bytes by the
  * document width. Catalyst's nested-column pruning handles it; this
  * spec pins that it actually reaches the scan's ReadSchema.
  */
class NestedPruningSpec extends SparkSpec {

  test("one-leaf projection prunes the docs scan to created.user") {
    OsmFixture.ensure(spark)
    val q = spark.read.parquet(OsmFixture.docsPath)
      .groupBy(col("created.user").as("user"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    val read = scans.head.requiredSchema
    // the scan must request the created struct ONLY, with the user leaf
    // only — not id/pos/tags/address/node_refs, not the other 4 leaves
    assert(read.fieldNames.toSeq == Seq("created"),
      s"scan should read only `created`, got ${read.simpleString}")
    val created = read("created").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(created.fieldNames.toSeq == Seq("user"),
      s"created struct should be pruned to `user`, got ${created.simpleString}")
  }
}
