package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** Smaller lesson pipelines: NYT JSON reshape (S11,
  * 01/nytimes.py:37-48) and the ERCOT worksheet stats (S5/A11/K2,
  * 01/excel_csv.py + 01/ercot_coast_stats.py).
  */
object Feeds {

  /** nytimes.py get_popularity_thumbnails: articles → explode `media`,
    * keep images whose media-metadata has the `Standard Thumbnail`
    * format, project (title, url).
    */
  def thumbnails(articles: DataFrame): DataFrame =
    articles
      .select(col("title"), explode(col("media")).as("m"))
      .filter(col("m.type") === "image")
      .select(col("title"), explode(col("m.media-metadata")).as("mm"))
      .filter(col("mm.format") === "Standard Thumbnail")
      .select(col("title"), col("mm.url").as("thumbnail"))

  /** ercot_coast_stats.py:34-44 — per-region max/min/avg load and the
    * argmax/argmin timestamps, from a long-format (region, serialTime,
    * load) table. argmax via max_by with a deterministic tiebreak on the
    * time column (SURVEY §2.5 A11).
    */
  def loadStats(longFormat: DataFrame): DataFrame =
    longFormat
      .select(col("region"),
        Clean.excelSerialToTimestamp(col("serial")).as("ts"),
        col("load").cast("double").as("load"))
      .groupBy("region")
      .agg(
        max(col("load")).as("max_load"),
        // argmax: lexicographic struct max = (max load, then latest ts) —
        // deterministic under load ties
        max(struct(col("load"), col("ts"))).getField("ts").as("max_ts"),
        min(col("load")).as("min_load"),
        avg(col("load")).as("avg_load"))
}
