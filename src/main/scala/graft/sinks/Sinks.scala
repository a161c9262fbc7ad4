package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY §2.2 K1-K6).
  *
  * The reference's terminal stores are NDJSON files and a MongoDB
  * collection; our engine's canonical store is Parquet + a registered
  * view (the "collection"), with NDJSON/CSV writers for parity.
  */
object Sinks {

  /** K1: NDJSON, one document per line; timestamps serialize ISO-8601
    * like the reference's bson json_util intent (data.py:138-151).
    */
  def ndjson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K2: pipe-delimited CSV with header (01/ercot_coast_stats.py:48-54). */
  def pipeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "|").option("header", "true").csv(path)

  /** K3: good/bad row routing (03/validity.py:47-57) in ONE pass:
    * partition the output by the validity flag instead of scanning twice
    * with complementary filters.
    */
  def routeByValidity(df: DataFrame, validCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(validCol).parquet(path)

  /** K4/K5: the "collection" load with drop-if-exists semantics
    * (README.md:822-849 mongoimport --drop): overwrite parquet + replace
    * the temp view.
    */
  def saveCollection(df: DataFrame, path: String, viewName: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    val back = df.sparkSession.read.parquet(path)
    back.createOrReplaceTempView(viewName)
    back
  }
}
