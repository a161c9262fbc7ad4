package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.queries.OsmQueries
import graft.shape.OsmShape
import graft.sources.OsmXml

/** End-to-end OSM pipeline test on the recreated example.osm fixture
  * (FIXTURES.md §1 golden counts: node 20, way 1, relation 1, tag 7,
  * nd 4, member 3; 6 distinct uids; key classes lower 5 / other 1 /
  * problemchars 1).
  */
class OsmPipelineSpec extends SparkSpec {

  private lazy val path =
    getClass.getResource("/example.osm").getPath
  private lazy val nodes = OsmXml.nodes(spark, path)
  private lazy val ways = OsmXml.ways(spark, path)
  private lazy val relations = OsmXml.relations(spark, path)
  private lazy val docs = OsmShape.shape(nodes, ways).cache()

  test("S1 element census (06/mapparser.py:29-36)") {
    assert(nodes.count() == 20)
    assert(ways.count() == 1)
    assert(relations.count() == 1)
    val ndCount = ways.select(explode(col("nd"))).count()
    assert(ndCount == 4)
    val memberCount = relations.select(explode(col("member"))).count()
    assert(memberCount == 3)
  }

  test("A8/P13 tag-key census (06/tags.py:56)") {
    val tagged = Seq(nodes, ways)
      .map(df => if (df.columns.contains("tag"))
        df.select(col("tag")) else df.select(lit(null).cast(
        "array<struct<_k:string,_v:string>>").as("tag")))
      .reduce(_ unionAll _)
      .filter(col("tag").isNotNull)
    val census = OsmQueries.keyClassCensus(tagged)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census == Map("lower" -> 5L, "other" -> 1L, "problemchars" -> 1L))
  }

  test("R3 shaping: doc count = nodes + ways (README.md:874)") {
    assert(OsmQueries.docCount(docs) == 21)
  }

  test("A7 distinct editors (06/users.py:34)") {
    assert(OsmQueries.distinctUsers(docs) == 6)
  }

  test("A1 counts by type (README.md:896-903)") {
    val got = OsmQueries.countsByType(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("node" -> 20L, "way" -> 1L))
  }

  test("T3 top contributors (README.md:911-925)") {
    val top = OsmQueries.topContributors(docs, 3).collect()
    assert(top.head.getString(0) == "alice" && top.head.getLong(1) == 5L)
  }

  test("R1 unwind node_refs (README.md:976-991)") {
    val refs = OsmQueries.mostReferencedNodes(docs, 10).collect()
    assert(refs.length == 4)
    assert(refs.forall(_.getLong(1) == 1L))
  }

  test("shaped document structure: created/pos/promoted/tags") {
    val r = docs.filter(col("id") === "1000001")
      .select(col("created.user"), col("created.timestamp").cast("string"),
        col("pos"), col("amenity"), col("cuisine"), col("name"),
        col("tags"))
      .collect()(0)
    assert(r.getString(0) == "alice")
    assert(r.getString(1) == "2012-03-28 18:31:23")
    assert(r.getSeq[Double](2) == Seq(37.2730791, -121.9966303))
    assert(r.getString(3) == "restaurant")
    assert(r.getString(4) == "mexican")
    assert(r.getString(5) == "La Fonda")
    assert(r.getMap[String, String](6).isEmpty)
  }

  test("problemchars tag keys are dropped; other-class keys kept in tags map") {
    val n2 = docs.filter(col("id") === "1000002").select("tags").collect()(0)
      .getMap[String, String](0)
    assert(n2 == Map("EXIT_TO" -> "Stevens Creek Blvd"))
    val n3 = docs.filter(col("id") === "1000003").select("tags").collect()(0)
      .getMap[String, String](0)
    assert(n3.isEmpty) // "turn lanes" has problemchars → dropped
  }

  test("way doc: node_refs array + promoted highway + tags tail") {
    val w = docs.filter(col("type") === "way")
      .select(col("node_refs"), col("highway"), col("tags")).collect()(0)
    assert(w.getSeq[String](0) == Seq("1000004", "1000005", "1000006", "1000007"))
    assert(w.getString(1) == "service")
    assert(w.getMap[String, String](2) == Map("building" -> "yes"))
  }

  test("R5 addr routing + street cleaning (README.md:673-696)") {
    import spark.implicits._
    // constructed raw rows: addr:street is cleaned, addr:street:name is
    // dropped (two colons), addr:city kept, problemchars dropped.
    val raw = Seq(
      ("9001", Seq(("addr:street", "N Lincoln Ave"), ("addr:city", "Cupertino"),
        ("addr:street:name", "ignored"), ("addr:postcode", "95014"),
        ("amenity", "cafe"), ("bad key", "x"))))
      .toDF("_id", "kv")
      .select(col("_id"),
        transform(col("kv"), t => struct(t.getField("_1").as("_k"),
          t.getField("_2").as("_v"))).as("tag"),
        lit("2").as("_version"), lit("42").as("_changeset"),
        lit("2012-03-28T18:31:23Z").as("_timestamp"),
        lit("u").as("_user"), lit("9").as("_uid"),
        lit("true").as("_visible"), lit(37.0).as("_lat"), lit(-122.0).as("_lon"))
    val doc = OsmShape.shapeNodes(raw).collect()(0)
    val addr = doc.getAs[Row]("address")
    assert(addr.getAs[String]("street") == "North Lincoln Avenue")
    assert(addr.getAs[String]("city") == "Cupertino")
    assert(addr.getAs[String]("postcode") == "95014")
    assert(addr.getAs[String]("housenumber") == null)
    assert(doc.getAs[String]("amenity") == "cafe")
    assert(doc.getAs[Map[String, String]]("tags").isEmpty)
  }

  test("F19/F20 capstone time queries run on shaped docs") {
    val dow = OsmQueries.editsByDayOfWeek(docs).collect()
    assert(dow.map(_.getLong(1)).sum == 21L)
    val stats = OsmQueries.editAgeStats(docs, "2026-01-01").collect()(0)
    assert(stats.getLong(2) == 21L)
    assert(stats.getDouble(0) > 0 && stats.getDouble(1) > stats.getDouble(0))
  }
}
