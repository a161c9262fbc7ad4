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

  private def read(spark: SparkSession, path: String, rowTag: String,
      schema: Option[String]): DataFrame = {
    val r = spark.read
      .option("rowTag", rowTag)
      .option("attributePrefix", "_")
    schema.fold(r)(s => r.schema(org.apache.spark.sql.types.StructType.fromDDL(s)))
      .xml(path)
  }

  /** Known attribute/child shape of the OSM 0.6 format. Supplying it
    * (instead of inferring) saves the inference pass over the file AND
    * pins optional columns (`_visible`, `tag`, `nd`) that inference
    * drops when the sampled file lacks them — everything lands as
    * string, exactly what OsmShape casts from anyway.
    */
  val nodeSchema: String =
    "_id STRING, _lat STRING, _lon STRING, _version STRING, _changeset STRING, " +
      "_timestamp STRING, _user STRING, _uid STRING, _visible STRING, " +
      "tag ARRAY<STRUCT<_k: STRING, _v: STRING>>"
  val waySchema: String =
    "_id STRING, _version STRING, _changeset STRING, _timestamp STRING, " +
      "_user STRING, _uid STRING, _visible STRING, " +
      "nd ARRAY<STRUCT<_ref: STRING>>, tag ARRAY<STRUCT<_k: STRING, _v: STRING>>"

  /** `<node>` elements: attributes + child `<tag k v>` array. */
  def nodes(spark: SparkSession, path: String, schema: Option[String] = None): DataFrame =
    read(spark, path, "node", schema)

  /** `<way>` elements: attributes + `<nd ref>` + `<tag>` arrays. */
  def ways(spark: SparkSession, path: String, schema: Option[String] = None): DataFrame =
    read(spark, path, "way", schema)

  /** `<relation>` elements: attributes + `<member>` + `<tag>` arrays. */
  def relations(spark: SparkSession, path: String, schema: Option[String] = None): DataFrame =
    read(spark, path, "relation", schema)
}
