package graft

import org.apache.spark.sql.functions._

import graft.functions.Clean

/** Golden tests for the cleaning library, ported from the reference's
  * inline asserts (SURVEY §5.1): street-name table README.md:407-511,
  * cardinal pairs README.md:565-567, encoded arrays name.py:55-57,
  * areaLand area.py:64-67, key classes tags.py, year logic validity.py.
  */
class CleanSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("v").select(c.as("r")).collect()(0).getString(0)

  test("F1 street type extraction (audit.py:18)") {
    assert(one(Clean.streetType(col("v")), "North Lincoln Ave") == "Ave")
    assert(one(Clean.streetType(col("v")), "Baker Blvd.") == "Blvd.")
    assert(one(Clean.streetType(col("v")), "Main Street") == "Street")
  }

  test("F3 street-type expansion (README.md:366-373, 407-511)") {
    val pairs = Seq(
      "N Lincoln Ave" -> "N Lincoln Avenue",
      "Baker Blvd." -> "Baker Boulevard",
      "Willow Rd" -> "Willow Road",
      "Park Dr" -> "Park Drive",
      "Elm St." -> "Elm Street",
      "Cherry Ln" -> "Cherry Lane",
      "Creek Pkwy" -> "Creek Parkway",
      "Main Street" -> "Main Street", // unmapped type untouched
      "Avenue of Oaks" -> "Avenue of Oaks") // only trailing token replaced
    pairs.foreach { case (in, want) =>
      assert(one(Clean.updateStreetName(col("v")), in) == want, s"for $in")
    }
  }

  test("F4 cardinal expansion applied after F3 (README.md:543-567)") {
    val pairs = Seq(
      "N Lincoln Ave" -> "North Lincoln Avenue",
      "S. Main St" -> "South Main Street",
      "E Duane Ave" -> "East Duane Avenue",
      "W. Olive Ave" -> "West Olive Avenue",
      "Wolfe Rd" -> "Wolfe Road") // W-prefixed word NOT expanded
    pairs.foreach { case (in, want) =>
      assert(one(Clean.cleanStreet(col("v")), in) == want, s"for $in")
    }
  }

  test("P13 key classification (tags.py:21-38)") {
    val cases = Seq(
      "amenity" -> "lower", "addr_street" -> "lower",
      "addr:street" -> "lower_colon",
      "EXIT_TO" -> "other", "turn lanes" -> "problemchars",
      "a;b" -> "problemchars")
    cases.foreach { case (in, want) =>
      assert(one(Clean.keyClass(col("v")), in) == want, s"for $in")
    }
  }

  test("F9 encoded-array decode (name.py:22-25, 55-57)") {
    val got = Seq("{Leptopelis|Leptopelis*}")
      .toDF("v").select(Clean.decodeEncodedArray(col("v")).as("r"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("Leptopelis", "Leptopelis"))
    val single = Seq("Madrid").toDF("v")
      .select(Clean.decodeEncodedArray(col("v")).as("r"))
      .collect()(0).getSeq[String](0)
    assert(single == Seq("Madrid"))
  }

  test("F16 longest-candidate areaLand fix (area.py:23-34, 64-67)") {
    val cases = Seq(
      ("{5.5166e+07|55.0}", Some(5.5166e7)),
      ("1.45816e+07", Some(1.45816e7)),
      ("NULL", None))
    cases.foreach { case (in, want) =>
      val row = Seq(in).toDF("v")
        .select(Clean.pickLongestAsDouble(col("v")).as("r")).collect()(0)
      val got = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      assert(got == want, s"for $in")
    }
  }

  test("F10 NULL sentinels (processing.py:87-90)") {
    val df = Seq("NULL", "", "x").toDF("v")
      .select(Clean.nullifySentinels(col("v")).as("r"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, None, Some("x")))
  }

  test("F13/validity year window (validity.py:37-42)") {
    val df = Seq("1989-01-01", "1885", "2015", "2000").toDF("v")
      .select(Clean.isValidYear(col("v")).as("r"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, false, false, true))
  }

  test("F14 year-range expansion (autos.py:118-138)") {
    val got = spark.range(1)
      .select(Clean.expandYearRanges(
        array(lit(2001), lit(1995)), array(lit(2003), lit(1996))).as("r"))
      .collect()(0).getSeq[Int](0)
    assert(got == Seq(1995, 1996, 2001, 2002, 2003))
  }

  test("F15 unit heuristics (autos.py:59-69)") {
    val dims = Seq(0.004, 4.5).toDF("v")
      .select(Clean.normalizeDimension(col("v")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(dims == Seq(4.0, 4.5))
  }

  test("F19 dayofweek is 1=Sunday (README.md:1208)") {
    val got = Seq("2026-08-09").toDF("v") // a Sunday
      .select(dayofweek(col("v").cast("date")).as("r"))
      .collect()(0).getInt(0)
    assert(got == 1)
  }

  test("F20 age in days with pinned now") {
    val got = Seq("2025-12-31 00:00:00").toDF("v")
      .select(Clean.ageInDays(col("v").cast("timestamp"),
        lit("2026-01-01").cast("timestamp")).as("r"))
      .collect()(0).getDouble(0)
    assert(got == 1.0)
  }

  test("URL canonicalization goldens") {
    val cases = Seq(
      // scheme/host case + default port + tracking params + sort + fragment
      ("HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#f",
        "http://example.com/a?a=1&b=2"),
      ("https://Example.com:443/a", "https://example.com/a"),
      // non-default port survives; :443 is NOT default for http
      ("http://example.com:8080/a", "http://example.com:8080/a"),
      ("http://example.com:443/a", "http://example.com:443/a"),
      // empty path → "/", repeated trailing slashes collapse
      ("https://example.com", "https://example.com/"),
      ("https://example.com///", "https://example.com/"),
      // all params tracking → query dropped entirely
      ("https://example.com/p?utm_medium=m&fbclid=1&gclid=2&ref=r",
        "https://example.com/p"),
      // utm prefix only — "uTm" is a different (kept) key; keys are
      // case-sensitive like real query strings
      ("https://example.com/p?uTm_x=1", "https://example.com/p?uTm_x=1"),
      // userinfo stripped
      ("https://user:pw@Example.com/a", "https://example.com/a"),
      // '?' INSIDE the fragment is not a query — nothing leaks through
      ("https://e.com/p#a?b=1", "https://e.com/p"),
      // real query AND a fragment containing '?': query survives, the
      // fragment (with its fake param) is dropped
      ("https://e.com/p?b=2&a=1#x?z=9", "https://e.com/p?a=1&b=2"),
      // non-URL input passes through untouched
      ("not a url", "not a url"))
    val got = cases.map(_._1).toDF("u")
      .select(Clean.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }
}
