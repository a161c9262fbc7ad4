package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cleaning / normalization column-function library.
  *
  * Re-expresses the reference's row-at-a-time Python cleaning helpers
  * (SURVEY.md §2.10, F1–F23) as pure Catalyst column expressions: every
  * function here survives whole-stage codegen, predicate pushdown and
  * column pruning — no UDFs.
  *
  * Reference cites (into /root/reference/): audit.py:18 (street-type
  * regex), README.md:366-373 (update_name), README.md:543-561 (cardinal
  * directions), tags.py:21-38 (key classification), name.py:22-25
  * (encoded arrays), processing.py:87-101, autos.py:37-138,
  * validity.py:36-42, 03-data-quality/area.py:23-34,
  * 02-data-in-more-complex-formats/process.py:58-76.
  */
object Clean {

  // ---------------------------------------------------------------------
  // F1/F2 — street auditing regexes (audit.py:18; README.md:200, 522)
  // ---------------------------------------------------------------------

  /** Last whitespace-delimited token, optionally dot-terminated — the
    * "street type" (`Rd.`, `Ave`, `Boulevard`). Python: `\b\S+\.?$`.
    */
  def streetType(name: Column): Column =
    regexp_extract(name, "(\\S+\\.?)$", 1)

  /** Leading cardinal-direction abbreviation `^[NSEW]\b\.?` (README.md:522). */
  def leadingCardinal(name: Column): Column =
    regexp_extract(name, "^([NSEW])\\b\\.?", 0)

  // ---------------------------------------------------------------------
  // F3/F4 — mapping-driven street-name expansion (README.md:366-373,
  // 543-561). Chain of conditional regexp_replace, one per mapping key:
  // only replaces when the extracted type is a mapping key, like the
  // notebook's update_name (root audit.py:73-81 is a buggy no-op; we
  // implement the notebook semantics per SURVEY §7.3).
  // ---------------------------------------------------------------------

  /** Street-type expansions, README.md:356-364. */
  val streetMapping: Map[String, String] = Map(
    "St" -> "Street", "St." -> "Street",
    "Ave" -> "Avenue", "Ave." -> "Avenue",
    "Blvd" -> "Boulevard", "Blvd." -> "Boulevard",
    "Dr" -> "Drive", "Dr." -> "Drive",
    "Ln" -> "Lane", "Ln." -> "Lane",
    "Pkwy" -> "Parkway", "Pkwy." -> "Parkway",
    "Rd" -> "Road", "Rd." -> "Road",
    "Ct" -> "Court", "Ct." -> "Court",
    "Cir" -> "Circle", "Cir." -> "Circle",
    "Hwy" -> "Highway", "Hwy." -> "Highway")

  /** Cardinal-direction expansions, README.md:543-552. */
  val cardinalMapping: Map[String, String] = Map(
    "N" -> "North", "N." -> "North",
    "S" -> "South", "S." -> "South",
    "E" -> "East", "E." -> "East",
    "W" -> "West", "W." -> "West")

  private def quote(s: String): String = java.util.regex.Pattern.quote(s)

  /** Expand an abbreviated trailing street type per `mapping` (F3). */
  def updateStreetName(name: Column,
      mapping: Map[String, String] = streetMapping): Column =
    mapping.toSeq.sortBy(_._1).foldLeft(name) { case (acc, (abbr, full)) =>
      // (?<=^|\s) poor-man's word boundary at token start; anchor at end.
      regexp_replace(acc, "(^|(?<=\\s))" + quote(abbr) + "$", full)
    }

  /** Expand a leading cardinal abbreviation (F4, applied after F3). */
  def updateCardinal(name: Column): Column =
    cardinalMapping.toSeq.sortBy(_._1).foldLeft(name) { case (acc, (abbr, full)) =>
      regexp_replace(acc, "^" + quote(abbr) + "(?=\\s|$)", full)
    }

  /** Full street cleaning = type expansion then cardinal expansion —
    * the double pass of README.md:683-687.
    */
  def cleanStreet(name: Column): Column = updateCardinal(updateStreetName(name))

  // ---------------------------------------------------------------------
  // F5 / P13 — tag-key classification (tags.py:21-38)
  // ---------------------------------------------------------------------

  val problemCharsPattern: String = "[=\\+/&<>;'\"\\?%#$@,\\. \\t\\r\\n]"

  /** True when the key contains a problematic character (tags.py:23). */
  def hasProblemChars(key: Column): Column = key.rlike(problemCharsPattern)

  /** Classify a tag key exactly like tags.py key_type:
    * lower / lower_colon / problemchars / other.
    */
  def keyClass(key: Column): Column =
    when(key.rlike("^([a-z]|_)*$"), "lower")
      .when(key.rlike("^([a-z]|_)*:([a-z]|_)*$"), "lower_colon")
      .when(hasProblemChars(key), "problemchars")
      .otherwise("other")

  // ---------------------------------------------------------------------
  // F6-F11 — small string normalizers
  // ---------------------------------------------------------------------

  /** `NULL` sentinel and empty string → null (processing.py:87-90,
    * autos.py:114-116) (F10).
    */
  def nullifySentinels(c: Column): Column =
    when(c === "NULL" || c === "", lit(null)).otherwise(c)

  /** Strip a trailing parenthesized qualifier: `"Adelophryne (frog)"` →
    * `"Adelophryne"` (processing.py:79-80); also `(automobile)`/`(city)`
    * removal anywhere in the string (autos.py:44-48) (F8).
    */
  def stripParenSuffix(c: Column): Column =
    trim(substring_index(c, " (", 1))

  /** Remove a specific parenthesized word, e.g. `(automobile)` (autos.py:44-48). */
  def stripParenWord(c: Column, word: String): Column =
    trim(regexp_replace(c, "\\s*\\(" + quote(word) + "\\)\\s*", " "))

  /** Alphanumeric-only test (processing.py:83-84) (F11). */
  def isAlnum(c: Column): Column = c.rlike("^[a-zA-Z0-9]+$")

  // ---------------------------------------------------------------------
  // F9 — DBpedia encoded-array decode: "{a|b|c}" → array<string>
  // (name.py:22-25; autos.py:50-57). Scalar value → single-element array.
  // ---------------------------------------------------------------------

  def decodeEncodedArray(c: Column): Column = {
    val cleaned = regexp_replace(c, "[{}*]", "")
    val items = transform(split(cleaned, "\\|"), x => trim(x))
    when(c.isNull, lit(null))
      .when(c.startsWith("{"), items)
      .otherwise(array(trim(regexp_replace(c, "\\*", ""))))
  }

  /** Longest candidate from an encoded array, cast to double — the
    * areaLand fixer (03-data-quality/area.py:23-34) (F16). Null when no
    * candidate parses.
    */
  def pickLongestAsDouble(c: Column): Column = {
    val arr = decodeEncodedArray(c)
    val longest = aggregate(arr, lit(""),
      (acc, x) => when(length(x) > length(acc), x).otherwise(acc))
    nullifySentinels(longest).cast("double")
  }

  // ---------------------------------------------------------------------
  // F12/F13 — numeric parse guards, year handling
  // ---------------------------------------------------------------------

  /** Null-on-failure double parse (Python float() guard) (F12). */
  def toDoubleOrNull(c: Column): Column = c.cast("double")

  /** Gregorian year from a gYear-ish string: first 4 chars as int
    * (validity.py:37-38; autos.py:71-72) (F13).
    */
  def yearOf(c: Column): Column = substring(c, 1, 4).cast("int")

  /** Reference's validity window 1886–2014 (validity.py:38-42). */
  def isValidYear(c: Column): Column = yearOf(c).between(1886, 2014)

  // ---------------------------------------------------------------------
  // F14 — year-pair expansion (autos.py:118-138): zip sorted start years
  // with sorted end years, expand each inclusive range. Pure built-ins.
  // ---------------------------------------------------------------------

  def expandYearRanges(starts: Column, ends: Column): Column =
    flatten(zip_with(sort_array(starts), sort_array(ends),
      (s, e) => sequence(s, e)))

  // ---------------------------------------------------------------------
  // F15 — unit heuristics (autos.py:59-69): dimensions recorded in metres
  // but sometimes in mm (value < 0.01 m is assumed to be km-scaled mm —
  // replicate the reference's exact heuristic); weight kg → tonnes.
  // ---------------------------------------------------------------------

  def normalizeDimension(c: Column): Column =
    when(c < 0.01, c * 1000).otherwise(c)

  def kgToTonnes(c: Column): Column = c / 1000

  // ---------------------------------------------------------------------
  // F17 — point-vs-(lat,long) consistency (03-data-quality/location.py:26-27)
  // ---------------------------------------------------------------------

  def locationConsistent(point: Column, lat: Column, lon: Column): Column =
    point === concat_ws(" ", lat, lon)

  // ---------------------------------------------------------------------
  // F18-F20 — timestamps
  // ---------------------------------------------------------------------

  /** OSM timestamp parse `%Y-%m-%dT%H:%M:%SZ` (README.md:657-658). */
  def parseOsmTimestamp(c: Column): Column =
    to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Mongo `$dayOfWeek` convention: 1=Sunday … 7=Saturday — matches
    * Spark's `dayofweek` exactly (README.md:1208) (F19).
    */
  def dayOfWeekMongo(ts: Column): Column = dayofweek(ts)

  /** Epoch millis that also accepts TIMESTAMP_NTZ columns (parquet naive
    * timestamps): NTZ→TZ cast is wall-clock-preserving under the UTC
    * session timezone, matching DuckDB's epoch_ms of a naive timestamp.
    */
  def epochMillis(ts: Column): Column = unix_millis(ts.cast("timestamp"))

  /** Age in (fractional) days between a pinned `now` and `ts` —
    * `$subtract`/`$divide` by 86,400,000 ms (README.md:1236-1238) (F20).
    * `now` is a parameter so tests/oracles are deterministic.
    */
  def ageInDays(ts: Column, now: Column): Column =
    (epochMillis(now) - epochMillis(ts)) / lit(86400000.0)

  // ---------------------------------------------------------------------
  // F21/F22 — HTML-table numerics and filename parsing
  // (02-data-in-more-complex-formats/process.py:58-76)
  // ---------------------------------------------------------------------

  /** De-comma then int-parse: "1,234" → 1234 (F21). */
  def commaInt(c: Column): Column =
    regexp_replace(c, ",", "").cast("long")

  /** `XX-YYY.html` basename → (courier, airport) (F22). */
  def courierOf(fileName: Column): Column =
    regexp_extract(fileName, "([A-Z0-9]{2})-([A-Z]{3})\\.html", 1)
  def airportOf(fileName: Column): Column =
    regexp_extract(fileName, "([A-Z0-9]{2})-([A-Z]{3})\\.html", 2)

  /** Excel serial date (days since 1899-12-30) → timestamp (S5,
    * 01-data-extraction-fundamentals/excel_csv.py:33-41). Seconds are
    * ROUNDED half-up like xlrd.xldate_as_tuple — fractional hours store
    * as repeating binary (0.041666… × 86400 = 3599.99999…), and
    * truncation would shift them a full second (01:00:00 → 00:59:59).
    */
  def excelSerialToTimestamp(c: Column): Column =
    timestamp_seconds(((c - lit(25569.0)) * 86400.0 + lit(0.5)).cast("long"))

  // ---------------------------------------------------------------------
  // URL canonicalization — the web-corpus dedup key. CommonCrawl-style
  // pipelines dedup by canonical URL before any content hashing; the
  // same page arrives as http://Example.com:80/a/?utm_source=x and
  // https://example.com/a — canonicalization collapses the spurious
  // variance. Pure column expressions (codegen'd), RE2-compatible
  // regexes so the DuckDB oracle replays them verbatim.
  // ---------------------------------------------------------------------

  /** Tracking query-params dropped by canonicalizeUrl (prefix match for
    * utm_*; exact key match otherwise).
    */
  val trackingParamPattern = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  /** Canonical form of an absolute http(s) URL:
    *   - scheme and host lowercased; userinfo (`user:pass@`) stripped;
    *   - default port stripped (:80 for http, :443 for https);
    *   - fragment stripped;
    *   - tracking params (utm_*, fbclid, gclid, msclkid, ref) dropped,
    *     remaining params sorted bytewise, empty query dropped;
    *   - repeated trailing slashes collapsed; empty path → "/".
    * Non-URL input (no scheme://) passes through unchanged. Idempotent:
    * canonical output re-canonicalizes to itself (CleanPropertySpec).
    */
  def canonicalizeUrl(c: Column): Column = {
    val scheme = lower(regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_replace(
      regexp_extract(rest, "^([^/?#]*)", 1), "^[^/?#@]*@", ""))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(rest, "^[^/?#]*([^?#]*)", 1)
    val path0 = regexp_replace(rawPath, "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // strip the fragment BEFORE extracting the query: '?' may first
    // occur inside the fragment ('…/p#a?b=1' has no real query, and the
    // fragment tail must not leak into the canonical key)
    val query = regexp_extract(regexp_replace(c, "#.*$", ""), "\\?(.*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(trackingParamPattern))), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
    when(c.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), canon).otherwise(c)
  }
}
