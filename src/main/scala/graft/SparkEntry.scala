package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CleanSuite, Core, ErcotSuite, EventSuite, MultimodalSuite, OsmSuite, TextSuite, VectorSuite, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-domain suites:
  *   - Core      — relational surface (SURVEY §2.3–§2.10) on the star schema
  *   - TextSuite — text analysis + dedup on `documents`
  *   - VectorSuite — similarity search on `embeddings`
  *   - EventSuite  — timestamps/JSON/windows on `events`
  */
object SparkEntry {

  val all: Map[String, Q] =
    Core.queries ++ TextSuite.queries ++ VectorSuite.queries ++
      EventSuite.queries ++ CleanSuite.queries ++ OsmSuite.queries ++
      MultimodalSuite.queries ++ ErcotSuite.queries

  /** Queries whose per-query bench time reads per-session memoized
    * state (trained indexes, dedup pipelines) rather than standing
    * alone — the first family member executed pays the build. Disclosed
    * as `memo_shared` in the bench artifact so cross-round per-query
    * comparisons stay interpretable.
    */
  val memoSharedQueries: Set[String] =
    TextSuite.memoShared ++ VectorSuite.memoShared ++
      MultimodalSuite.memoShared +
      "p14_layout_range_skip" + // first run pays the range-sorted write
      "p15_zorder_two_col_skip" + // first run pays the z-ordered write
      "p16_bloom_point_lookup" + // first run pays the bloom-layout write
      "p17_bucketed_join_zero_shuffle" // first run pays the bucketed writes

  /** One-time fixture builds (the ~50 MB OSM extract) — called by
    * Bench/Verify up front so no single query's timing pays the build.
    */
  def warm(spark: SparkSession): Unit = {
    try graft.pipelines.OsmFixture.ensure(spark)
    catch { case e: Throwable =>
      System.err.println(s"[warm] OSM fixture build failed: ${e.getMessage}") }
    try graft.pipelines.MultimodalFixture.ensure(spark)
    catch { case e: Throwable =>
      System.err.println(s"[warm] multimodal fixture build failed: ${e.getMessage}") }
    try graft.pipelines.Ercot.ensure(spark)
    catch { case e: Throwable =>
      System.err.println(s"[warm] ERCOT fixture build failed: ${e.getMessage}") }
  }

  /** Force every per-session memo (index builds, dedup pipelines) for
    * `dir`, timed per item — the bench's builds section: with the
    * builds run and charged here, the per-query bench numbers measure
    * warm query time (the production at-rest split: indexes are built
    * at ingest, queries read them). Items a false `go()` skips return
    * -1.0 and fall back to the old lazy first-family-member charging.
    * Ordered cheap-to-expensive families so a deadline-cut phase still
    * warms the most entries.
    */
  def prebuild(spark: SparkSession, dir: String,
      go: () => Boolean = () => true): Seq[(String, Double)] =
    Core.prebuild(spark, dir, go) ++
      MultimodalSuite.prebuild(spark, go) ++
      TextSuite.prebuild(spark, dir, go) ++
      VectorSuite.prebuild(spark, dir, go)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("a1_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. (Every declared query currently ships a
    * full SQL oracle — including MinHash/SimHash/LSH/IVF, whose hashes
    * are engine-replicable integer arithmetic rebuilt in DuckDB SQL;
    * a query omitted here would fall back to the driver's weaker
    * rows-only check.)
    */
  def oracleSql: Map[String, String] =
    all.collect { case (name, Q(_, Some(sql), _)) => name -> sql }
}
