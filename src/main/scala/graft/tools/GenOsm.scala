package graft.tools

import java.io.{BufferedWriter, File, FileWriter}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** Deterministic synthetic OSM XML generator.
  *
  * The reference ETL runs on a ~50 MB metro extract with 243,046
  * elements (README.md:874); example.osm (43 lines) exercises none of
  * that scale. This generator recreates the reference's input SHAPE —
  * bare nodes, `addr:*` tags with dirty street/postcode/city variants,
  * promoted amenity/cuisine/name keys, problem-character keys, deeper
  * `addr:street:name` keys, ways with skewed `<nd ref>` fan-in — at the
  * reference's real input size, so the XML source + shaper + capstone
  * queries (o1..o13) are oracle-checked at scale.
  *
  * Everything is a fixed-seed LCG: re-running yields byte-identical XML,
  * so the parquet fixture (and therefore the DuckDB oracle) is stable
  * across rounds without committing 50 MB to git.
  */
object GenOsm {

  /** 64-bit LCG (MMIX constants) — deterministic, no java.util.Random. */
  private final class Rng(seed0: Long) {
    private var s: Long = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    /** Uniform in [0, bound). */
    def nextInt(bound: Int): Int = (((nextLong() >>> 33) % bound).toInt)
    def pick[A](xs: IndexedSeq[A]): A = xs(nextInt(xs.length))
    /** Skewed toward low indices (min of two uniforms) — zipf-ish. */
    def pickSkewed[A](xs: IndexedSeq[A]): A =
      xs(math.min(nextInt(xs.length), nextInt(xs.length)))
  }

  // --- pools (reference flavor: README.md:40-55 dirty street audit) ----
  private val streetBases = Vector("Main", "Telegraph", "Shattuck", "College",
    "Broadway", "Market", "Mission", "Park", "Oak", "Cedar", "Webster",
    "Harrison", "Franklin", "Grand", "Lakeshore", "Piedmont", "Claremont",
    "Adeline", "Alcatraz", "Ashby", "University", "San Pablo", "Foothill",
    "Fruitvale", "High", "Seminary", "Macarthur", "International")
  // dirty + clean suffixes: the shaper's F3 expansion normalizes these
  private val streetSuffixes = Vector("Street", "St", "St.", "Avenue", "Ave",
    "Ave.", "Boulevard", "Blvd", "Blvd.", "Road", "Rd", "Rd.", "Drive", "Dr",
    "Lane", "Ln", "Court", "Ct", "Place", "Pl", "Way", "Parkway", "Pkwy")
  private val cardinals = Vector("", "", "", "", "", "", "N ", "E ", "S ", "W ",
    "North ", "East ")
  private val postcodes = Vector("94601", "94602", "94606", "94607", "94610",
    "94611", "94612", "94618", "94702", "94703", "94704", "94705", "94709",
    "CA 94612", "CA 94704") // dirty state-prefixed variants
  private val cities = Vector("Oakland", "Oakland", "Oakland", "Oakland",
    "Berkeley", "Berkeley", "Emeryville", "Piedmont", "Alameda", "oakland")
  private val amenities = Vector("parking", "parking", "parking", "parking",
    "restaurant", "restaurant", "restaurant", "school", "school",
    "place_of_worship", "place_of_worship", "bank", "bank", "cafe", "cafe",
    "fast_food", "hospital", "library", "fuel", "pharmacy")
  private val cuisines = Vector("mexican", "chinese", "pizza", "japanese",
    "american", "burger", "italian", "thai", "vietnamese", "sandwich")
  private val bankNames = Vector("Bank of America", "Chase", "Wells Fargo",
    "Citibank", "Union Bank")
  private val highways = Vector("residential", "residential", "residential",
    "secondary", "tertiary", "primary", "service", "footway")
  private val tailKeys = Vector("building", "source", "barrier", "landuse",
    "leisure", "shop", "religion", "operator")
  private val problemKeys = Vector("odd key", "a.b", "shop&more", "k,v")
  private def userPool(n: Int): Vector[String] =
    (0 until n).map(i => f"mapper_$i%03d").toVector
  // realistic low-frequency OSM keys used as FILLER when an exact tag
  // census is requested (all class "lower"; overflow cycles get a
  // ":<n>" suffix → "lower_colon")
  private val fillerKeys = Vector("wikidata", "wikipedia", "ele", "layer",
    "surface", "lit", "lanes", "maxspeed", "oneway", "access", "bicycle",
    "foot", "width", "tracktype", "smoothness", "incline", "sidewalk",
    "cycleway", "bridge", "tunnel", "ref", "old_ref", "int_ref", "network",
    "route", "denomination", "wheelchair", "opening_hours", "website",
    "fee", "capacity", "covered", "start_date", "height", "levels",
    "material", "roof", "colour", "direction", "note")

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(ZoneOffset.UTC)
  private val tsBase = 1199145600L // 2008-01-01T00:00:00Z
  private val tsRange = 194e6.toLong // → ~2014-02

  def nodeId(i: Int): Long = 1000000L + i
  def wayId(i: Int): Long = 5000000L + i

  /** The planted high-fan-in node ids (o5's expected top-3). */
  def hubIds: Seq[Long] = Seq(nodeId(0), nodeId(1), nodeId(2))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** The reference's San Francisco census — the scale point its
    * commented asserts pin (mapparser.py:29-36: 1,510,907 nodes /
    * 117,911 ways; tags.py:56-59: 5,925,339 tags; users.py:34: 1,120
    * contributors). [[write]] reproduces it exactly with
    * `nNodes = sfNodes, nWays = sfWays, nUsers = sfUsers,
    * targetTags = Some(sfTags), coverUsers = true` (OsmScaleSpec's
    * capstone case).
    */
  val sfNodes = 1510907
  val sfWays = 117911
  val sfUsers = 1120
  val sfTags = 5925339L

  /** Write the synthetic extract. Default sizes sum to the reference's
    * 243,046-element count at ~50 MB on disk.
    *
    * `targetTags` — when set, the generator emits EXACTLY that many
    * `<tag>` elements: a deterministic feedback controller spreads
    * filler tags (realistic low-frequency OSM keys) across elements on
    * top of the rolled content — fill ≈ deficit/remaining with a small
    * under-fill margin so the trajectory can never overshoot — and the
    * final element closes the count exactly. `coverUsers` forces the
    * first `nUsers` elements through the pool in order so every
    * contributor appears at least once (a skewed random pick over 1,120
    * users leaves the rarest tail users unsampled with non-trivial
    * probability even at 1.6M draws). Both default OFF so the 243k
    * metro fixture stays byte-identical.
    */
  def write(path: String, nNodes: Int = 220000, nWays: Int = 23046,
      seed: Long = 42L, nUsers: Int = 400,
      targetTags: Option[Long] = None, coverUsers: Boolean = false): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val users = userPool(nUsers)
    val w = new BufferedWriter(new FileWriter(f), 1 << 20)
    val rng = new Rng(seed)
    var nTags = 0L
    var elemsLeft = nNodes.toLong + nWays.toLong
    var elemOrdinal = 0L
    def attr(k: String, v: String): String = s""" $k="${esc(v)}""""
    def tag(sb: StringBuilder, k: String, v: String): Unit = {
      nTags += 1
      sb.append("    <tag").append(attr("k", k)).append(attr("v", v)).append("/>\n")
    }
    /** Exact-census controller: called once per element AFTER its
      * rolled tags. Fill floor(deficit/remaining) − 3 keys (the margin
      * out-paces the ~1.2-tag/element rolled average, so the deficit
      * never goes negative); the last element closes exactly.
      */
    def fillTags(sb: StringBuilder): Unit = targetTags.foreach { target =>
      val deficit = target - nTags
      val fill: Long =
        if (elemsLeft <= 1) math.max(0L, deficit)
        else math.min(64L, math.max(0L, deficit / elemsLeft - 3L))
      var j = 0L
      while (j < fill) {
        val base = fillerKeys((j % fillerKeys.length).toInt)
        val k = if (j < fillerKeys.length) base
                else s"$base:${j / fillerKeys.length}"
        tag(sb, k, "gen")
        j += 1
      }
      elemsLeft -= 1
    }

    def common(sb: StringBuilder, id: Long): Unit = {
      // Reproduce the reference's contributor skew: its top editor owns
      // 27.2% of all documents (n76 = 66,090 of 243,046, README.md:923).
      // user 0 gets ~27% of elements; the rest spread over the pool
      // with a mild low-index bias. This is the skew witness o16/o17's
      // salted operators exist for.
      val uIdx =
        if (coverUsers && elemOrdinal < nUsers) elemOrdinal.toInt
        else if (rng.nextInt(1000) < 272) 0
        else 1 + math.min(rng.nextInt(users.length - 1),
          rng.nextInt(users.length - 1))
      elemOrdinal += 1
      val ts = tsFmt.format(Instant.ofEpochSecond(
        tsBase + ((rng.nextLong() >>> 11) % tsRange)))
      sb.append(attr("id", id.toString))
        .append(attr("version", (1 + rng.nextInt(5)).toString))
        .append(attr("changeset", (1000000 + rng.nextInt(9000000)).toString))
        .append(attr("timestamp", ts))
        .append(attr("user", users(uIdx)))
        .append(attr("uid", (10000 + uIdx).toString))
      if (rng.nextInt(10) == 0) sb.append(attr("visible", "true"))
    }

    def addressTags(sb: StringBuilder): Unit = {
      tag(sb, "addr:housenumber", (1 + rng.nextInt(4999)).toString)
      tag(sb, "addr:street", cardinals(rng.nextInt(cardinals.length)) +
        rng.pick(streetBases) + " " + rng.pick(streetSuffixes))
      if (rng.nextInt(10) < 6) tag(sb, "addr:postcode", rng.pick(postcodes))
      if (rng.nextInt(10) < 5) tag(sb, "addr:city", rng.pick(cities))
      if (rng.nextInt(10) < 3) tag(sb, "addr:state", "CA")
      if (rng.nextInt(20) == 0) tag(sb, "addr:street:name", "junk") // dropped by R5
    }

    def amenityTags(sb: StringBuilder, i: Int): Unit = {
      val a = rng.pick(amenities)
      tag(sb, "amenity", a)
      a match {
        case "restaurant" =>
          if (rng.nextInt(10) < 8) tag(sb, "cuisine", rng.pickSkewed(cuisines))
          if (rng.nextInt(10) < 5) tag(sb, "name", s"Restaurant $i")
        case "bank" =>
          if (rng.nextInt(10) < 9) tag(sb, "name", rng.pickSkewed(bankNames))
        case _ =>
          if (rng.nextInt(10) < 4) tag(sb, "name", s"Place $i")
      }
      if (rng.nextInt(10) < 2) tag(sb, "phone", f"510-555-${rng.nextInt(10000)}%04d")
    }

    w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    w.write("<osm version=\"0.6\" generator=\"graft-gen\">\n")

    var i = 0
    while (i < nNodes) {
      val sb = new StringBuilder(256)
      sb.append("  <node")
      common(sb, nodeId(i))
      sb.append(attr("lat", (37.70000 + rng.nextInt(200000) / 1e6).toString))
        .append(attr("lon", (-122.30000 + rng.nextInt(200000) / 1e6).toString))
      // rolled tags go to a side buffer so the exact-census filler can
      // open an otherwise-bare node; with targetTags off the buffer is
      // empty exactly when the old code wrote the self-closing form,
      // so default output stays byte-identical
      val tb = new StringBuilder(128)
      val roll = rng.nextInt(100)
      if (roll < 55) () // bare node (unless filler opens it)
      else if (roll < 75) addressTags(tb)
      else if (roll < 90) amenityTags(tb, i)
      else if (roll < 98) {
        tag(tb, rng.pick(tailKeys), "yes")
        if (rng.nextInt(10) < 3) tag(tb, "highway", rng.pick(highways))
      } else tag(tb, rng.pick(problemKeys), "x")
      fillTags(tb)
      if (tb.isEmpty) sb.append("/>\n")
      else sb.append(">\n").append(tb).append("  </node>\n")
      w.write(sb.toString); i += 1
    }

    i = 0
    while (i < nWays) {
      val sb = new StringBuilder(512)
      sb.append("  <way")
      common(sb, wayId(i))
      sb.append(">\n")
      // planted hubs give o5 a deterministic, well-separated top-3
      if (i % 2 == 0) sb.append(s"""    <nd ref="${nodeId(0)}"/>\n""")
      if (i % 3 == 0) sb.append(s"""    <nd ref="${nodeId(1)}"/>\n""")
      if (i % 5 == 0) sb.append(s"""    <nd ref="${nodeId(2)}"/>\n""")
      val nRefs = 3 + rng.nextInt(12)
      var j = 0
      while (j < nRefs) {
        sb.append(s"""    <nd ref="${nodeId(3 + rng.nextInt(nNodes - 3))}"/>\n""")
        j += 1
      }
      val roll = rng.nextInt(100)
      if (roll < 70) {
        tag(sb, "highway", rng.pick(highways))
        if (rng.nextInt(10) < 3) tag(sb, "name", rng.pick(streetBases) + " " +
          rng.pick(streetSuffixes))
      } else if (roll < 80) addressTags(sb)
      else if (roll < 85) tag(sb, rng.pick(problemKeys), "x")
      fillTags(sb)
      sb.append("  </way>\n")
      w.write(sb.toString); i += 1
    }

    w.write("</osm>\n")
    w.close()
    targetTags.foreach { t =>
      require(nTags == t,
        s"exact-census controller failed: emitted $nTags of $t tags")
    }
  }
}
