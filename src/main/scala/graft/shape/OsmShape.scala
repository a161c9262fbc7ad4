package graft.shape

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** OSM element → document shaper: the heart of the reference's ETL
  * (`shape_element`, README.md:645-707; data.py:96-135), re-expressed as
  * one `select` of column expressions (SURVEY §2.9 R3/R5).
  *
  * Target schema (README.md:573-596; FIXTURES.md §2):
  *   id, type ('node'|'way'), visible,
  *   created struct<version, changeset, timestamp, user, uid>,
  *   pos array<double>            -- [lat, lon]
  *   address struct<housenumber, postcode, street, city, state>,
  *   node_refs array<string>      -- ways only
  *   amenity, cuisine, name, phone, highway,  -- promoted tag keys
  *   tags map<string,string>      -- open non-addr tail
  *
  * Tag routing (README.md:673-696):
  *   - keys with problem characters are dropped (data.py:91);
  *   - `addr:X` (single colon) land in the address struct; deeper
  *     `addr:X:Y` keys are dropped (README.md:605-613);
  *   - `addr:street` is cleaned: street-type expansion then cardinal
  *     expansion (README.md:683-687 — the notebook's intended semantics;
  *     the notebook itself has an unbound-variable bug there, see
  *     SURVEY §7.3);
  *   - everything else is promoted to a typed column (known query keys)
  *     or kept in the `tags` map (open tail, §1.3 $exists mapping).
  */
object OsmShape {

  /** Tag keys promoted to top-level typed columns (the keys the
    * reference's query suite touches, README.md:868-1242).
    */
  val promotedKeys: Seq[String] = Seq("amenity", "cuisine", "name", "phone", "highway")

  val addressKeys: Seq[String] = Seq("housenumber", "postcode", "street", "city", "state")

  /** The `created` sub-document attribute set (data.py:13: CREATED). */
  private def createdStruct: Column =
    struct(
      col("_version").cast("string").as("version"),
      col("_changeset").cast("string").as("changeset"),
      Clean.parseOsmTimestamp(col("_timestamp")).as("timestamp"),
      col("_user").cast("string").as("user"),
      col("_uid").cast("string").as("uid"))

  /** Valid (non-problemchars) tag entries as array<struct<k,v>>. */
  private def validTags: Column =
    filter(coalesce(col("tag"), array().cast("array<struct<_k:string,_v:string>>")),
      t => !Clean.hasProblemChars(t.getField("_k")))

  private def tagsOf(kind: String): Column = kind match {
    case "addr" => // addr:X with exactly one colon → (X, value)
      transform(
        filter(validTags, t => t.getField("_k").startsWith("addr:") &&
          !substring_index(t.getField("_k"), "addr:", -1).contains(":")),
        t => struct(substring_index(t.getField("_k"), "addr:", -1).as("k"),
          t.getField("_v").as("v")))
    case "tail" => // non-addr open tail (promoted keys are ALSO here in
      // Mongo — they're top-level fields either way; we keep the map
      // free of promoted keys to avoid double storage)
      filter(validTags, t => !t.getField("_k").startsWith("addr") &&
        !t.getField("_k").isInCollection(promotedKeys))
    case "promoted" =>
      filter(validTags, t => t.getField("_k").isInCollection(promotedKeys))
  }

  /** Address struct with cleaned street (F3+F4 double pass). */
  private def addressStruct: Column = {
    val m = map_from_entries(
      when(size(tagsOf("addr")) > 0, tagsOf("addr")).otherwise(lit(null)))
    val fields = addressKeys.map {
      case "street" => Clean.cleanStreet(element_at(m, "street")).as("street")
      case k => element_at(m, k).as(k)
    }
    when(m.isNotNull, struct(fields: _*)).otherwise(lit(null))
  }

  private def promotedCols: Seq[Column] = {
    val m = map_from_entries(tagsOf("promoted"))
    promotedKeys.map(k => element_at(m, k).as(k))
  }

  private def tailMap: Column =
    map_from_entries(tagsOf("tail")).as("tags")

  private def shaped(df: DataFrame, elemType: String, withRefs: Boolean): DataFrame = {
    val pos =
      if (elemType == "node")
        array(col("_lat").cast("double"), col("_lon").cast("double")).as("pos")
      else lit(null).cast("array<double>").as("pos")
    val refs =
      if (withRefs)
        transform(coalesce(col("nd"), array().cast("array<struct<_ref:string>>")),
          n => n.getField("_ref").cast("string")).as("node_refs")
      else lit(null).cast("array<string>").as("node_refs")
    val cols = Seq(
      col("_id").cast("string").as("id"),
      lit(elemType).as("type"),
      col("_visible").cast("string").as("visible"),
      createdStruct.as("created"),
      pos,
      addressStruct.as("address"),
      refs) ++ promotedCols :+ tailMap
    df.select(cols: _*)
  }

  /** Shape `<node>` rows (from OsmXml.nodes). */
  def shapeNodes(nodes: DataFrame): DataFrame = {
    val base = ensureCols(nodes, Map("tag" -> "array<struct<_k:string,_v:string>>",
      "_visible" -> "string"))
    shaped(base, "node", withRefs = false)
  }

  /** Shape `<way>` rows (from OsmXml.ways). */
  def shapeWays(ways: DataFrame): DataFrame = {
    val base = ensureCols(ways, Map("tag" -> "array<struct<_k:string,_v:string>>",
      "_visible" -> "string", "nd" -> "array<struct<_ref:string>>"))
    shaped(base, "way", withRefs = true)
  }

  /** Full shaped collection: nodes ∪ ways (relations are excluded, like
    * the reference — README.md:874 loads 243,046 = nodes + ways).
    */
  def shape(nodes: DataFrame, ways: DataFrame): DataFrame =
    shapeNodes(nodes).unionByName(shapeWays(ways))

  /** Add missing optional columns as typed nulls (XML schema inference
    * drops elements absent from the sampled file).
    */
  private def ensureCols(df: DataFrame, want: Map[String, String]): DataFrame =
    want.foldLeft(df) { case (acc, (name, tpe)) =>
      if (acc.columns.contains(name)) acc
      else acc.withColumn(name, lit(null).cast(tpe))
    }
}
