package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (SURVEY §2.12: the reference has no streaming queries — this is the
  * engine-extension slice, reusing the same aggregations as the batch
  * EventSuite so batch and stream stay semantically twinned).
  */
object EventStream {

  /** Parquet schema of the events table as stored (ts = nanos long via
    * spark.sql.legacy.parquet.nanosAsLong, set by Graft.session).
    */
  val storedSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) surfaced as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream over a directory of events parquet, ts converted
    * to a proper timestamp (event time).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(storedSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window rollup with watermark — the streaming twin of
    * EventSuite e1: per (window, event_type) count + value sum.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  // --- gap-based sessionization via the built-in session_window --------
  // Preference order (SURVEY §7.2): compose existing operators before
  // custom state. Event-time session windows with a watermark express
  // gap sessionization declaratively — the state management, timeout
  // bookkeeping and spill behavior are Spark's own (and incremental
  // session merging scales better than a hand-rolled
  // flatMapGroupsWithState, which this Spark build also mis-plans —
  // see the verify skill's gotchas).

  /** Streaming exact dedup on `event_id` — the streaming twin of
    * Dedup.exact. `dropDuplicatesWithinWatermark` keeps per-key state
    * only until the watermark passes the key's event time, which is the
    * only dedup contract with BOUNDED state on an unbounded stream (a
    * plain dropDuplicates would retain every key forever); duplicates
    * arriving within the horizon — the at-least-once-delivery case — are
    * dropped exactly.
    */
  def dedupe(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Per-user gap sessions: event-time `session_window(ts, gap)` with a
    * watermark. Works identically over a stream (append after watermark)
    * and a batch frame.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"), col("total_value"))
  }
}
