package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

/** Edge-case semantics of the composed interval joins (the corpus-level
  * behavior is oracle-checked; these pin the boundary rules).
  */
class JoinsSpec extends AnyFunSuite {

  private lazy val spark = Graft.session("local[4]", 4)
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf: equal timestamp matches; no prior row → null; latest wins") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0), // equal ts → matches l1
      (1L, ts("2024-01-01 11:00:00"), 200.0), // latest before l2
      (2L, ts("2024-01-01 09:30:00"), 300.0)  // AFTER l3 → no match
    ).toDF("k", "ts", "v")
    val out = Joins.asOf(left, right, "k", "ts", Seq("v"))
      .orderBy("k", "ts")
      .select("tag", "asof_v").as[(String, Option[Double])].collect()
    assert(out === Array(("l1", Some(100.0)), ("l2", Some(200.0)), ("l3", None)))
  }

  test("rangeJoinByBucket: start inclusive, end exclusive, multi-bucket spans, no dup pairs") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start of iv1 → included
      (2L, ts("2024-01-03 00:00:00")), // == end of iv1 → excluded; inside iv2
      (3L, ts("2024-01-02 12:00:00")), // inside iv1 AND iv2
      (4L, ts("2024-02-01 00:00:00"))  // outside all
    ).toDF("pid", "ts")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")), // 2 days
      (20L, ts("2024-01-02 00:00:00"), ts("2024-01-09 00:00:00"))  // 7 days
    ).toDF("iid", "ws", "we")
    val out = Joins.rangeJoinByBucket(points, intervals, "ts", "ws", "we",
        bucketMs = 24L * 3600 * 1000)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(out === Array((1L, 10L), (2L, 20L), (3L, 10L), (3L, 20L)))
  }

  test("Geo.boxJoin equals the brute-force box join, incl. cell-boundary points") {
    import graft.operators.Geo
    // deterministic scatter with points ON cell boundaries (multiples of r)
    val r = 0.01
    val pts = (0 until 300).map { i =>
      val lat = 37.70 + (i % 17) * 0.0031 + (if (i % 5 == 0) 0.01 else 0.0)
      val lon = -122.30 + (i % 23) * 0.0027
      (i.toLong, lat, lon)
    }
    val left = pts.filter(_._1 % 3 == 0).toDF("a_id", "a_lat", "a_lon")
    val right = pts.filter(_._1 % 3 != 0).toDF("b_id", "b_lat", "b_lon")
    val blocked = Geo.boxJoin(left, right, "a_lat", "a_lon", "b_lat", "b_lon", r)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    val brute = left.crossJoin(right)
      .filter(abs(col("a_lat") - col("b_lat")) <= r &&
        abs(col("a_lon") - col("b_lon")) <= r)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    assert(brute.nonEmpty && blocked === brute)
  }
}
