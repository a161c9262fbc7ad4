package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.OsmQueries
import graft.shape.OsmShape
import graft.sources.OsmXml
import graft.tools.GenOsm

/** The GenOsm → OsmXml (explicit schema) → OsmShape → capstone-query
  * path at small scale. The SAME code runs at 243k elements in
  * OsmFixture for the o1..o13 oracles; this spec pins the generator's
  * planted invariants fast (2.3k elements).
  */
class OsmScaleSpec extends SparkSpec {

  private val nNodes = 2000
  private val nWays = 300

  private lazy val dir = Files.createTempDirectory("osmscale").toString
  private lazy val xml = s"$dir/synth.osm"
  private lazy val docs = {
    GenOsm.write(xml, nNodes, nWays)
    OsmShape.shape(
      OsmXml.nodes(spark, xml, Some(OsmXml.nodeSchema)),
      OsmXml.ways(spark, xml, Some(OsmXml.waySchema))).cache()
  }

  test("generator is deterministic and shaper keeps every element") {
    assert(docs.count() == nNodes + nWays)
    val xml2 = s"$dir/synth2.osm"
    GenOsm.write(xml2, nNodes, nWays)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(java.nio.file.Paths.get(xml)),
      Files.readAllBytes(java.nio.file.Paths.get(xml2))))
  }

  test("type counts split nodes/ways exactly") {
    val byType = OsmQueries.countsByType(docs).collect()
      .map(r => r.getString(r.fieldIndex("type")) -> r.getLong(r.fieldIndex("count")))
      .toMap
    assert(byType == Map("node" -> nNodes.toLong, "way" -> nWays.toLong))
  }

  test("planted hubs are the top referenced nodes with expected fan-in") {
    val top = OsmQueries.mostReferencedNodes(docs, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(top.map(_._1).toSeq ==
      GenOsm.hubIds.map(_.toString)) // 1000000, 1000001, 1000002
    // i%2 / i%3 / i%5 over 300 ways
    assert(top(0)._2 == 150L && top(1)._2 == 100L && top(2)._2 == 60L)
  }

  test("address routing: postcodes/cities exist, deeper addr keys dropped") {
    assert(OsmQueries.postcodes(docs).count() > 0)
    assert(OsmQueries.cities(docs).count() > 0)
    // addr:street:name never reaches the address struct or the tag map
    assert(docs.filter(col("tags")("street:name").isNotNull).count() == 0)
    // dirty suffixes were expanded by the shaper (F3: no bare 'St' tail)
    assert(docs.filter(col("address.street").rlike(" (St|Rd|Ave|Blvd)\\.?$"))
      .count() == 0)
  }

  test("promoted keys queryable: amenities, banks, cuisines, dow, ages") {
    assert(OsmQueries.topAmenities(docs).count() > 0)
    val banks = OsmQueries.topBanks(docs).collect()
    assert(banks.nonEmpty && banks.forall(_.getLong(1) > 0))
    assert(OsmQueries.topCuisines(docs).count() > 0)
    val dows = OsmQueries.editsByDayOfWeek(docs).collect()
      .map(_.getAs[Number](0).longValue)
    assert(dows.forall(d => d >= 1 && d <= 7))
    val Array(age) = OsmQueries.editAgeStats(docs, "2015-01-01 00:00:00").collect()
    val (newest, oldest) = (age.getDouble(0), age.getDouble(1))
    assert(newest > 300 && oldest < 2600 && newest < oldest) // 2008..2014 data
    assert(age.getLong(2) == nNodes + nWays)
  }

  test("raw key census sees all four key classes") {
    val tagged = Seq(
      OsmXml.nodes(spark, xml, Some(OsmXml.nodeSchema)).select(col("tag")),
      OsmXml.ways(spark, xml, Some(OsmXml.waySchema)).select(col("tag")))
      .reduce(_ unionAll _)
    val classes = OsmQueries.keyClassCensus(tagged).collect()
      .map(r => r.getString(0)).toSet
    assert(classes == Set("lower", "lower_colon", "problemchars", "other"))
  }
}
