package graft

/** Driver-contract smoke: entry() returns rows; every declared query has
  * consistent metadata (oracle SQL keys ⊆ query keys); a sample of
  * queries runs at sf0.001.
  */
class EntrySmokeSpec extends SparkSpec {

  test("entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qk)
    assert(missing.isEmpty, s"oracle SQL without query: $missing")
  }

  test("per-session memo keys distinguish sessions sharing a context") {
    // DedupShared/PqShared key on Q.sessionKey: two sessions over the
    // same SparkContext must NOT share memoized frames (each session has
    // its own catalog/cache state)
    val other = spark.newSession()
    assert(graft.queries.Q.sessionKey(spark) != graft.queries.Q.sessionKey(other))
    assert(graft.queries.Q.sessionKey(spark) == graft.queries.Q.sessionKey(spark))
  }

  test("representative queries run at sf0.001") {
    val sample = Seq("a1_pricing_summary", "j3_multiway_revenue",
      "w2_lag_running_sum", "x1_token_stats", "v1_norms", "e1_hourly_rollup")
    sample.foreach { name =>
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
