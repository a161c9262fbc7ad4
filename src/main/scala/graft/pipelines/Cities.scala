package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** DBpedia cities pipeline: validity split, name/area fixes, per-field
  * type audit, location-consistency check
  * (03-data-quality/{validity,name,area,audit,location}.py).
  */
object Cities {

  /** K3 good/bad routing (validity.py:36-57): keep dbpedia URIs with a
    * foundingDate year in [1886, 2014]* — returns the input annotated
    * with `is_valid` so callers can route with one pass
    * (write.partitionBy or two complementary filters).
    *
    * *The reference applies the year window to autos; for cities it
    * checks the URI + parseability — we expose the predicate as a column
    * so variants compose.
    */
  def validity(df: DataFrame, yearCol: String = "foundingDate"): DataFrame =
    df.withColumn("is_valid",
      col("URI").contains("dbpedia.org") &&
        (Clean.nullifySentinels(col(yearCol)).isNull || Clean.isValidYear(col(yearCol))))

  /** F9 name fix (name.py:22-25): `{a|b}`-encoded multi-names → array. */
  def fixName(c: Column): Column =
    when(Clean.nullifySentinels(c).isNull, lit(null))
      .otherwise(Clean.decodeEncodedArray(c))

  /** F16 areaLand fix (area.py:23-34): longest encoded candidate as double. */
  def fixArea(c: Column): Column = Clean.pickLongestAsDouble(c)

  /** F17 location consistency (location.py:26-27). */
  def locationConsistent(df: DataFrame): DataFrame =
    df.withColumn("location_ok",
      Clean.locationConsistent(col("point"), col("`wgs84_pos#lat`"),
        col("`wgs84_pos#long`")))

  /** A10 per-field type audit (03/audit.py:37-50): for each audited
    * column, the set of observed Python-ish types {NULL, list, int,
    * float, str} — same classifier ordering as the reference.
    */
  def typeAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val classified = cols.map { c =>
      sort_array(collect_set(typeOf(col(s"`$c`")))).as(c)
    }
    df.agg(classified.head, classified.tail: _*)
  }

  /** audit.py type classifier: NULL sentinel → NULL; "{...}" → list;
    * integer-regex → int; float-castable → float; else str.
    */
  def typeOf(c: Column): Column =
    when(c.isNull || c === "NULL", "NULL")
      .when(c.startsWith("{"), "list")
      .when(c.rlike("^-?[0-9]+$"), "int")
      .when(c.cast("double").isNotNull, "float")
      .otherwise("str")

  /** Cleaned city documents for the lesson-05 query shapes
    * (04/example_city.json): name (first fixed candidate), country,
    * isPartOf array, population, lat/lon, foundingDate, areaLand.
    */
  def clean(df: DataFrame): DataFrame =
    df.select(
      element_at(fixName(col("name")), 1).as("name"),
      Clean.nullifySentinels(col("country_label")).as("country"),
      when(Clean.nullifySentinels(col("isPartOf_label")).isNotNull,
        Clean.decodeEncodedArray(col("isPartOf_label"))).as("isPartOf"),
      Clean.nullifySentinels(col("populationTotal")).cast("long").as("population"),
      Clean.nullifySentinels(col("`wgs84_pos#lat`")).cast("double").as("lat"),
      Clean.nullifySentinels(col("`wgs84_pos#long`")).cast("double").as("lon"),
      to_timestamp(Clean.nullifySentinels(col("foundingDate")), "yyyy-MM-dd")
        .as("foundingDate"),
      fixArea(col("areaLand")).as("areaLand"))
}
