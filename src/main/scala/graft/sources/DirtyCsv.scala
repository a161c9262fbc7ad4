package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV scans for the DBpedia infobox dumps and other dirty CSVs
  * (SURVEY §2.1 S2-S4).
  *
  * The reference skips 3 metadata pseudo-rows after the header
  * (autos.py:33-35, processing.py:63-65, name.py:36-39): repeated
  * URI/label/type rows. Spark has no ordinal skip (rows have no order in
  * a distributed scan — by design), so the skip becomes a CONTENT filter:
  * real data rows carry a dbpedia.org resource URI, pseudo-rows don't.
  * This is the scalable form: it parallelizes, ordinal skipping doesn't.
  */
object DirtyCsv {

  /** S2: plain header CSV. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** S4: DBpedia dump — header + 3 metadata pseudo-rows filtered by
    * content (`URI` must be a dbpedia resource).
    */
  def readDbpedia(spark: SparkSession, path: String,
      uriCol: String = "URI"): DataFrame =
    read(spark, path).filter(col(uriCol).contains("dbpedia.org"))

  /** S3: CSV whose first line is out-of-band metadata (e.g. `Station
    * Name,BEAUFORT`) and whose SECOND line is the header
    * (01/parsecsv.py:23-33). The skip is inherently ordinal, so the file
    * is line-split driver-side (these are small single files in the
    * reference; a 100 TB variant would carry the title in the path or a
    * sidecar, not in row 1). Returns (title, data).
    */
  def readWithTitleLine(spark: SparkSession, path: String): (String, DataFrame) = {
    import spark.implicits._
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String]).toSeq
    val title = lines.head.split(",").last.trim
    val data = spark.read.option("header", "true").csv(lines.tail.toDS())
    (title, data)
  }

  /** S5: Excel-worksheet-equivalent input. The bundled jars have no xlsx
    * source; the worksheet is modeled as CSV with an excel-serial time
    * column (converted by Clean.excelSerialToTimestamp).
    */
  def readExcelCsv(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
}
