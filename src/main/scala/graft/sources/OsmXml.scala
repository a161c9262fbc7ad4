package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OSM XML source (SURVEY §2.1 S1).
  *
  * The reference streams a 50 MB extract through ElementTree.iterparse
  * (mapparser.py:18, data.py:143) — single-threaded, constant memory. On
  * Spark the equivalent is the built-in XML source (Spark 4 ships it in
  * core): one pass per rowTag, split across executors, schema inferred
  * or supplied. At 100 TB the XML files are split by the source's own
  * record-boundary detection, so parallelism is free.
  */
object OsmXml {

  private def read(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read
      .option("rowTag", rowTag)
      .option("attributePrefix", "_")
      .xml(path)

  /** `<node>` elements: attributes + child `<tag k v>` array. */
  def nodes(spark: SparkSession, path: String): DataFrame = read(spark, path, "node")

  /** `<way>` elements: attributes + `<nd ref>` + `<tag>` arrays. */
  def ways(spark: SparkSession, path: String): DataFrame = read(spark, path, "way")

  /** `<relation>` elements: attributes + `<member>` + `<tag>` arrays. */
  def relations(spark: SparkSession, path: String): DataFrame = read(spark, path, "relation")
}
