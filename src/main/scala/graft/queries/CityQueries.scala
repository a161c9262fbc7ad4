package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lesson-05 aggregation pipelines over the cleaned cities collection
  * (05-analyzing-data scripts) — each MongoDB pipeline as a DataFrame chain.
  */
object CityQueries {

  /** 05/most_common_city_name.py:37-44: `$exists name` → group → top 1. */
  def mostCommonCityName(cities: DataFrame): DataFrame =
    cities.filter(col("name").isNotNull)
      .groupBy("name").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("name").asc)
      .limit(1)

  /** 05/region_cities.py:29-35: match country+lon range, unwind isPartOf,
    * group regions, top 1. The `$match` stays BEFORE the unwind (the
    * efficient order; Catalyst would push it anyway — SURVEY §4.1).
    */
  def regionWithMostCities(cities: DataFrame, country: String = "India",
      lonMin: Double = 75, lonMax: Double = 80): DataFrame =
    cities.filter(col("country") === country &&
        col("lon").between(lonMin, lonMax))
      .select(explode(col("isPartOf")).as("region"))
      .groupBy("region").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("region").asc)
      .limit(1)

  /** 05/indian_regions_with_most_cities.py:33-36 — unwind-first variant;
    * semantically identical (predicate doesn't touch the unwound field),
    * and Catalyst pushes the filter below the generate, unlike MongoDB
    * which executed the wasteful written order verbatim.
    */
  def regionsWithMostCitiesUnwindFirst(cities: DataFrame,
      country: String = "India", k: Int = 3): DataFrame =
    cities.select(col("country"), explode(col("isPartOf")).as("region"))
      .filter(col("country") === country)
      .groupBy("region").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("region").asc)
      .limit(k)

  /** 05/avg_population.py:34-42: per-(country, region) avg population,
    * then avg of those avgs per country. Two passes — NOT collapsed into
    * a global avg (A4 semantics, SURVEY §2.5).
    */
  def avgRegionalPopulation(cities: DataFrame): DataFrame =
    cities.filter(col("isPartOf").isNotNull && col("population").isNotNull)
      .select(col("country"), explode(col("isPartOf")).as("region"),
        col("population"))
      .groupBy("country", "region")
      .agg(avg(col("population")).as("avg_regional_pop"))
      .groupBy("country")
      .agg(avg(col("avg_regional_pop")).as("avg_pop"))

  /** 05/avg_city_pop_for_indian_regions.py:35-43: constant `_id` final
    * stage = global aggregation over the per-region avgs.
    */
  def avgCityPopForCountry(cities: DataFrame, country: String = "India"): DataFrame =
    cities.filter(col("country") === country && col("population").isNotNull &&
        col("isPartOf").isNotNull)
      .select(explode(col("isPartOf")).as("region"), col("population"))
      .groupBy("region").agg(avg(col("population")).as("avg"))
      .agg(avg(col("avg")).as("avg"))
}
