package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** HTML extraction sources (SURVEY §2.1 S7-S9): the reference scrapes
  * option lists, data tables and hidden form fields with BeautifulSoup
  * (02-data-in-more-complex-formats/{carriers,airports,process,html_soup}.py).
  * The markup is machine-generated and regular, so regex extraction over
  * `wholetext` documents is exact — and unlike a DOM parser it runs as a
  * codegen'd expression per file, parallel across files.
  */
object Html {

  private def readWhole(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .withColumn("file", input_file_name())

  /** S7: `<select id=X>` option values (carriers.py:16-25), one row per
    * option, minus the `All*` aggregate entries the reference drops.
    */
  def optionList(spark: SparkSession, path: String, selectId: String): DataFrame = {
    val select = regexp_extract(col("value"),
      "(?s)<select[^>]*id=\"" + selectId + "\"[^>]*>(.*?)</select>", 1)
    readWhole(spark, path)
      .select(explode(regexp_extract_all(select,
        lit("<option value=\"([^\"]*)\""), lit(1))).as("option"))
      .filter(!col("option").startsWith("All"))
  }

  /** S9: hidden form fields `__EVENTVALIDATION` / `__VIEWSTATE`
    * (html_soup.py:15-23).
    */
  def hiddenFields(spark: SparkSession, path: String): DataFrame =
    readWhole(spark, path).select(
      regexp_extract(col("value"),
        "id=\"__EVENTVALIDATION\"\\s+value=\"([^\"]*)\"", 1).as("eventvalidation"),
      regexp_extract(col("value"),
        "id=\"__VIEWSTATE\"\\s+value=\"([^\"]*)\"", 1).as("viewstate"))

  /** S8: `<tr class="dataTDRight">` data-table rows (process.py:41-76):
    * per row [month, domestic, international]; TOTAL rows dropped;
    * comma-grouped ints parsed; (courier, airport) from the file name.
    */
  def flightTable(spark: SparkSession, path: String): DataFrame = {
    val rows = readWhole(spark, path)
      .select(col("file"),
        explode(regexp_extract_all(col("value"),
          lit("(?s)<tr class=\"dataTDRight\">(.*?)</tr>"), lit(1))).as("row"))
      .withColumn("cells", regexp_extract_all(col("row"),
        lit("(?s)<td[^>]*>(.*?)</td>"), lit(1)))
    rows
      .filter(!col("cells").getItem(1).contains("TOTAL"))
      .select(
        Clean.courierOf(col("file")).as("courier"),
        Clean.airportOf(col("file")).as("airport"),
        col("cells").getItem(0).cast("int").as("year"),
        col("cells").getItem(1).cast("int").as("month"),
        struct(
          Clean.commaInt(col("cells").getItem(2)).as("domestic"),
          Clean.commaInt(col("cells").getItem(3)).as("international"))
          .as("flights"))
  }
}
