package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** The capstone query suite (README.md:868-1242) over the shaped OSM
  * collection (OsmShape.shape output registered as a DataFrame).
  *
  * Each MongoDB pipeline maps 1:1 to a DataFrame chain; `$exists` is
  * `isNotNull` on promoted/struct columns (SURVEY §1.3). Sort+limit
  * queries carry deterministic tiebreaks (SURVEY §2.7 T4).
  */
object OsmQueries {

  /** README.md:874 — total document count. */
  def docCount(docs: DataFrame): Long = docs.count()

  /** README.md:888 — distinct editors. */
  def distinctUsers(docs: DataFrame): Long =
    docs.select("created.user").distinct().count()

  /** README.md:896-903 — `$group` by element type. */
  def countsByType(docs: DataFrame): DataFrame =
    docs.groupBy("type").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("type").asc)

  /** README.md:911-925 — top contributors. */
  def topContributors(docs: DataFrame, k: Int = 3): DataFrame =
    docs.groupBy(col("created.user").as("user"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("user").asc)
      .limit(k)

  /** README.md:976-991 — `$unwind node_refs`, most-referenced nodes. */
  def mostReferencedNodes(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(explode(col("node_refs")).as("ref"))
      .groupBy("ref").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("ref").asc)
      .limit(k)

  /** README.md:1056-1065 — postcode histogram (`$exists` + group). */
  def postcodes(docs: DataFrame): DataFrame =
    docs.filter(col("address.postcode").isNotNull)
      .groupBy(col("address.postcode").as("postcode"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("postcode").asc)

  /** README.md:1101-1111 — city histogram. */
  def cities(docs: DataFrame): DataFrame =
    docs.filter(col("address.city").isNotNull)
      .groupBy(col("address.city").as("city"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("city").asc)

  /** README.md:1140-1150 — top amenities. */
  def topAmenities(docs: DataFrame, k: Int = 10): DataFrame =
    docs.filter(col("amenity").isNotNull)
      .groupBy("amenity").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("amenity").asc)
      .limit(k)

  /** README.md:1169-1179 — top banks (match + group on name). */
  def topBanks(docs: DataFrame, k: Int = 10): DataFrame =
    docs.filter(col("amenity") === "bank" && col("name").isNotNull)
      .groupBy("name").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("name").asc)
      .limit(k)

  /** README.md:1186-1196 — top cuisines among restaurants. */
  def topCuisines(docs: DataFrame, k: Int = 10): DataFrame =
    docs.filter(col("amenity") === "restaurant" && col("cuisine").isNotNull)
      .groupBy("cuisine").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("cuisine").asc)
      .limit(k)

  /** README.md:1208-1223 — `$dayOfWeek` histogram of edit timestamps
    * (1=Sunday … 7=Saturday).
    */
  def editsByDayOfWeek(docs: DataFrame): DataFrame =
    docs.groupBy(dayofweek(col("created.timestamp")).as("dayOfWeek"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("dayOfWeek").asc)

  /** README.md:1231-1242 — `$push` of per-document edit age in days
    * relative to a pinned `now` (deterministic F20), then stats.
    */
  def editAgeStats(docs: DataFrame, nowIso: String): DataFrame =
    docs.select(Clean.ageInDays(col("created.timestamp"),
        lit(nowIso).cast("timestamp")).as("ageInDays"))
      .agg(min(col("ageInDays")).as("newest"),
        max(col("ageInDays")).as("oldest"),
        count(lit(1)).as("n"))

  /** The tag-key census of mapparser.py:16-21 / tags.py (A8 + P13): runs
    * on RAW tag arrays (pre-shaping), counting key classes.
    */
  def keyClassCensus(rawTagged: DataFrame): DataFrame =
    rawTagged.select(explode(col("tag")).as("t"))
      .select(Clean.keyClass(col("t._k")).as("cls"))
      .groupBy("cls").agg(count(lit(1)).as("count"))
      .orderBy("cls")
}
