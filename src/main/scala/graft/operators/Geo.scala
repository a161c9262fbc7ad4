package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar geospatial primitives over (lat, lon) columns — the extension
  * surface for the OSM `pos` data the reference stores but never
  * queries (README.md:580: pos = [lat, lon]).
  *
  * Scale shape: everything is grid-cell blocking. Pair generation is an
  * equi-join on cell ids (shuffle by cell, bounded fan-out, AQE-skew
  * friendly), never a cross join with a distance predicate — the same
  * candidates-then-verify pattern as the LSH dedup operators.
  */
object Geo {

  /** Integer grid cell of a coordinate at `cellSize` degrees. */
  def cell(c: Column, cellSize: Double): Column =
    floor(c / lit(cellSize)).cast("long")

  /** Box join: all (left, right) pairs with |Δlat| ≤ radius AND
    * |Δlon| ≤ radius. The LEFT side is exploded to its 3×3 neighbor
    * cells (cell size = radius, so neighbors cover every in-box pair);
    * the right side keeps one cell key — pass the SMALLER side as
    * `left`. Column names must be disjoint across the two inputs.
    */
  def boxJoin(left: DataFrame, right: DataFrame,
      latL: String, lonL: String, latR: String, lonR: String,
      radius: Double): DataFrame = {
    val offsets = array((-1 to 1).flatMap(i => (-1 to 1).map(j =>
      struct(lit(i.toLong).as("di"), lit(j.toLong).as("dj")))): _*)
    val l = left
      .withColumn("__o", explode(offsets))
      .withColumn("__cla", cell(col(latL), radius) + col("__o.di"))
      .withColumn("__clo", cell(col(lonL), radius) + col("__o.dj"))
      .drop("__o")
    val r = right
      .withColumn("__cra", cell(col(latR), radius))
      .withColumn("__cro", cell(col(lonR), radius))
    l.join(r, col("__cla") === col("__cra") && col("__clo") === col("__cro"))
      .filter(abs(col(latL) - col(latR)) <= radius &&
        abs(col(lonL) - col(lonR)) <= radius)
      .drop("__cla", "__clo", "__cra", "__cro")
  }
}
