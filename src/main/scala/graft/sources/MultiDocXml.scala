package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S10: multi-document XML splitter (02/split_data.py:17-44) — a single
  * file holds N concatenated `<?xml ...>` documents; assign each line a
  * document id with a running count of `<?xml` prefixes.
  *
  * The running split needs line order: `spark.read.text` has no row
  * order, so order is recovered from a per-file line index. For the
  * reference's single-file patent dump a one-partition window is exact;
  * at scale the upstream fix is "don't concatenate XML docs" — this
  * operator exists for parity with the reference's repair step.
  */
object MultiDocXml {

  /** One row per (doc_id, line); doc_id is 0-based in encounter order. */
  def splitLines(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("file", input_file_name())
      .withColumn("idx", monotonically_increasing_id())
    val w = Window.partitionBy(col("file")).orderBy(col("idx"))
    lines
      .withColumn("doc_id",
        sum(when(col("value").startsWith("<?xml"), 1L).otherwise(0L)).over(w) - 1L)
      .select(col("doc_id"), col("idx"), col("value"))
  }

  /** Reassembled documents: doc_id → full XML text (lines re-ordered by
    * their index inside the group — collect_list alone has no order).
    */
  def documents(spark: SparkSession, path: String): DataFrame =
    splitLines(spark, path)
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("value")))),
          s => s.getField("value")), "\n").as("xml"))
}
