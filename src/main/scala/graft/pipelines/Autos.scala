package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** DBpedia autos infobox cleaning pipeline (04/autos.py:9-30, 141-172;
  * SURVEY §2.9 R4 + §2.10 F8/F9/F12-F15).
  *
  * Input: DirtyCsv.readDbpedia over an autos dump. Output shape
  * (04/example_car.json):
  *   name, manufacturer, bodyStyle, class, layout, assembly array<string>,
  *   dimensions struct<length,width,height,weight,wheelbase: double>,
  *   modelYears array<int>, productionYears array<int>
  */
object Autos {

  /** Column rename map (autos.py:9-30 FIELDS). */
  val fields: Map[String, String] = Map(
    "rdf-schema#label" -> "name",
    "manufacturer_label" -> "manufacturer",
    "bodyStyle_label" -> "bodyStyle",
    "class_label" -> "class",
    "layout_label" -> "layout",
    "assembly_label" -> "assembly")

  private def cleanLabel(c: org.apache.spark.sql.Column) =
    Clean.nullifySentinels(
      Clean.stripParenWord(Clean.stripParenWord(c, "automobile"), "city"))

  private def dim(name: String) =
    Clean.normalizeDimension(
      Clean.nullifySentinels(col(name)).cast("double")).as(name)

  def clean(df: DataFrame): DataFrame =
    df.select(
      cleanLabel(col("`rdf-schema#label`")).as("name"),
      cleanLabel(col("manufacturer_label")).as("manufacturer"),
      cleanLabel(col("bodyStyle_label")).as("bodyStyle"),
      cleanLabel(col("class_label")).as("class"),
      cleanLabel(col("layout_label")).as("layout"),
      // multi-valued, possibly "{a|b}"-encoded, paren-suffixed entries
      when(Clean.nullifySentinels(col("assembly_label")).isNotNull,
        transform(Clean.decodeEncodedArray(col("assembly_label")),
          x => Clean.stripParenSuffix(x))).as("assembly"),
      struct(
        dim("length"), dim("width"), dim("height"),
        Clean.kgToTonnes(Clean.nullifySentinels(col("weight")).cast("double"))
          .as("weight"),
        dim("wheelbase")).as("dimensions"),
      yearsArray("modelStartYear", "modelEndYear").as("modelYears"),
      yearsArray("productionStartYear", "productionEndYear").as("productionYears"))

  /** Year-range expansion (autos.py:118-138): gYear-ish start/end values
    * (possibly "{...|...}"-encoded multi-ranges) → inclusive int array.
    */
  private def yearsArray(startCol: String, endCol: String) = {
    val starts = yearList(startCol)
    val ends = yearList(endCol)
    when(starts.isNotNull && ends.isNotNull && size(starts) === size(ends),
      Clean.expandYearRanges(starts, ends))
  }

  private def yearList(c: String) =
    when(Clean.nullifySentinels(col(c)).isNotNull,
      filter(transform(Clean.decodeEncodedArray(col(c)), y => Clean.yearOf(y)),
        y => y.isNotNull))
}
