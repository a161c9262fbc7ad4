package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * At 100 TB a single hot group/join key overflows whatever partition it
  * hashes to — the reference corpus itself is the witness: the top OSM
  * contributor owns 27.2% of all 243k documents (README.md:923). Three
  * lines of defense, in preference order:
  *
  *   1. AQE skew-join splitting — free, but only rebalances sort-merge
  *      JOIN inputs; it cannot split aggregation state.
  *   2. Partial (map-side) aggregation — free, and sufficient for
  *      fixed-size state (count/sum/min/max). Ineffective when per-group
  *      state grows with the data: `countDistinct`/`collect_set` still
  *      funnel every distinct value of the hot key through one reducer.
  *   3. Explicit salting (this file): split one logical key into
  *      `nSalts` physical sub-keys, aggregate/join per sub-key, then
  *      merge. State and join fan-out per task drop by ~nSalts.
  *
  * Salts here are DETERMINISTIC (hash-derived, never `rand()`): results
  * are engine-replicable for the DuckDB oracle, and task retries under
  * speculative execution recompute identical sub-keys (a `rand()` salt
  * re-deals rows on retry, silently corrupting per-sub-key partials).
  */
object Skew {

  /** Exact distinct count per (possibly skewed) key, two-phase.
    *
    * Salting by `hash(value) % nSalts` puts every copy of one distinct
    * value in the SAME sub-key, so the per-(key, salt) distinct sets are
    * disjoint and summing their sizes per key is exact. The hot key's
    * distinct-value state is spread over `nSalts` reducers instead of
    * accumulating in one. Nulls are not counted (COUNT DISTINCT
    * semantics); `xxhash64(null)` is the seed constant, never null, so
    * no row is dropped by its salt.
    */
  def saltedDistinctCount(df: DataFrame, keyCol: String, valueCol: String,
      nSalts: Int = 32): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(valueCol)), lit(nSalts.toLong)).cast("int"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("n_distinct"))

  /** Skewed equi-join: `big` (skewed on `key`, too large to broadcast
    * either side) joins `small` with the hot key spread over `nSalts`
    * partitions.
    *
    * The big side's salt is a deterministic hash of `bigSaltCols`
    * (columns that vary WITHIN a key — e.g. the row id); the small side
    * is replicated once per salt via `explode(sequence(...))`. The join
    * key becomes (key, salt), so the hot key's rows land on `nSalts`
    * reducers, each holding a full copy of the small side's rows for
    * that key. Row multiplicity is unchanged — each big row carries
    * exactly one salt — so the result equals the unsalted join exactly
    * (inner and left joins; right/full would multiply unmatched small
    * rows and are rejected).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigSaltCols: Seq[String], nSalts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer",
      s"salted join supports inner/left only, got $joinType")
    val b = big.withColumn("__salt",
      pmod(xxhash64(bigSaltCols.map(col): _*), lit(nSalts.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
