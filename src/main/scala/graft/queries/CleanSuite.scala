package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.functions.Clean

/** Oracle-checked coverage for the cleaning/scalar operator surface
  * (SURVEY.md §2.10 F3-F22, §2.5 A9/A10, §2.3 P5/P11, §2.6, §2.8) that
  * the Core suite doesn't reach. Inputs are constructed deterministically
  * from testdata columns (integer-derived strings only — double→string
  * rendering differs between engines and is never relied on).
  */
object CleanSuite {

  private val cardinals = Seq("N", "S", "E", "W", "N.", "S.", "North", "Middle")
  private val suffixes = Seq("Rd", "St", "Ave.", "Blvd", "Way", "Street")

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ",", "]")

  val queries: Map[String, Q] = Map(

    // --- F3/F4 mapping-driven street cleaning (README.md:366-373) -----
    "c1_street_clean" -> Q(
      (s, dir) => {
        val c = table(s, dir, "customer").filter(col("c_custkey") < 500)
        val first = element_at(
          array(cardinals.map(lit): _*), (col("c_custkey") % 8 + 1).cast("int"))
        val last = element_at(
          array(suffixes.map(lit): _*), (col("c_custkey") % 6 + 1).cast("int"))
        val raw = concat_ws(" ", first, col("c_name"), last)
        c.select(col("c_custkey"), raw.as("raw"),
            Clean.cleanStreet(raw).as("cleaned"))
          .orderBy("c_custkey")
      },
      Some {
        val cardCase = Clean.cardinalMapping.toSeq.sortBy(_._1)
          .map { case (a, f) => s"WHEN '$a' THEN '$f'" }.mkString(" ")
        val stCase = Clean.streetMapping.toSeq.sortBy(_._1)
          .map { case (a, f) => s"WHEN '$a' THEN '$f'" }.mkString(" ")
        s"""WITH base AS (
          |  SELECT c_custkey, c_name,
          |    ${sqlList(cardinals)}[CAST(c_custkey % 8 + 1 AS INT)] AS f,
          |    ${sqlList(suffixes)}[CAST(c_custkey % 6 + 1 AS INT)] AS l
          |  FROM customer WHERE c_custkey < 500)
          |SELECT c_custkey, f || ' ' || c_name || ' ' || l AS raw,
          |  (CASE f $cardCase ELSE f END) || ' ' || c_name || ' ' ||
          |  (CASE l $stCase ELSE l END) AS cleaned
          |FROM base ORDER BY c_custkey""".stripMargin
      },
      "F3/F4 street-type + cardinal expansion (notebook update_name semantics)"),

    // --- F16 longest-candidate pick from encoded array ----------------
    "c2_encoded_pick" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part")
        val enc = concat(lit("{"), col("p_size").cast("string"), lit("|"),
          col("p_partkey").cast("string"), lit("}"))
        p.select(col("p_partkey"), enc.as("enc"),
            Clean.pickLongestAsDouble(enc).as("picked"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
        |  '{' || CAST(p_size AS VARCHAR) || '|' || CAST(p_partkey AS VARCHAR) || '}' AS enc,
        |  CAST(CASE WHEN length(CAST(p_partkey AS VARCHAR)) > length(CAST(p_size AS VARCHAR))
        |       THEN CAST(p_partkey AS VARCHAR) ELSE CAST(p_size AS VARCHAR) END AS DOUBLE) AS picked
        |FROM part ORDER BY p_partkey""".stripMargin),
      "F16 longest-candidate-then-parse (03-data-quality/area.py:23-34)"),

    // --- F10 sentinel nulling + A10 type-inference audit --------------
    "c3_type_audit" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part")
        val m = col("p_partkey") % 5
        val dirty = when(m === 0, lit("NULL")).when(m === 1, lit(""))
          .when(m === 2, col("p_size").cast("string"))
          .when(m === 3, concat(col("p_size").cast("string"), lit(".5")))
          .otherwise(col("p_type"))
        val clean = Clean.nullifySentinels(dirty)
        val cls = when(clean.isNull, "none")
          .when(clean.rlike("^[0-9]+$"), "int")
          .when(clean.rlike("^[0-9]*\\.[0-9]+$"), "float")
          .otherwise("str")
        p.select(cls.as("inferred_type"))
          .groupBy("inferred_type").agg(count(lit(1)).as("n"))
          .orderBy("inferred_type")
      },
      Some("""WITH dirty AS (
        |  SELECT CASE p_partkey % 5
        |    WHEN 0 THEN 'NULL' WHEN 1 THEN ''
        |    WHEN 2 THEN CAST(p_size AS VARCHAR)
        |    WHEN 3 THEN CAST(p_size AS VARCHAR) || '.5'
        |    ELSE p_type END AS v
        |  FROM part),
        |cleaned AS (SELECT CASE WHEN v = 'NULL' OR v = '' THEN NULL ELSE v END AS v FROM dirty)
        |SELECT CASE WHEN v IS NULL THEN 'none'
        |    WHEN regexp_matches(v, '^[0-9]+$') THEN 'int'
        |    WHEN regexp_matches(v, '^[0-9]*\.[0-9]+$') THEN 'float'
        |    ELSE 'str' END AS inferred_type,
        |  COUNT(*) AS n
        |FROM cleaned GROUP BY 1 ORDER BY inferred_type""".stripMargin),
      "F10 NULL-sentinel nulling + A10 per-field type census (03/audit.py:37-50)"),

    // --- F13 year extraction + validity window (K3 split counts) ------
    "c4_year_window" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val ys = (lit(1800) + col("o_orderkey") % 300).cast("string")
        o.select(Clean.isValidYear(ys).as("is_valid"), Clean.yearOf(ys).as("y"))
          .groupBy("is_valid")
          .agg(count(lit(1)).as("n"),
            sum(col("y").cast("long")).as("sum_year"))
          .orderBy("is_valid")
      },
      Some("""WITH y AS (
        |  SELECT CAST(substr(CAST(1800 + o_orderkey % 300 AS VARCHAR), 1, 4) AS INT) AS yr
        |  FROM orders)
        |SELECT yr BETWEEN 1886 AND 2014 AS is_valid, COUNT(*) AS n,
        |  CAST(SUM(CAST(yr AS BIGINT)) AS BIGINT) AS sum_year
        |FROM y GROUP BY 1 ORDER BY is_valid""".stripMargin),
      "F13 year parse + 1886-2014 validity window (validity.py:37-42); K3 split counts"),

    // --- F7/F8/F11 label cleaning -------------------------------------
    "c5_label_strip" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part").filter(col("p_partkey") < 400)
        val base = when(col("p_partkey") % 2 === 0,
          translate(col("p_brand"), "#", "")).otherwise(col("p_brand"))
        val label = concat(base, lit(" ("), col("p_type"), lit(")"))
        p.select(col("p_partkey"), label.as("label"),
            Clean.stripParenSuffix(label).as("name"),
            Clean.isAlnum(Clean.stripParenSuffix(label)).as("is_alnum"))
          .orderBy("p_partkey")
      },
      Some("""WITH base AS (
        |  SELECT p_partkey,
        |    (CASE WHEN p_partkey % 2 = 0 THEN translate(p_brand, '#', '') ELSE p_brand END)
        |      || ' (' || p_type || ')' AS label
        |  FROM part WHERE p_partkey < 400)
        |SELECT p_partkey, label,
        |  trim(split_part(label, ' (', 1)) AS name,
        |  regexp_matches(trim(split_part(label, ' (', 1)), '^[a-zA-Z0-9]+$') AS is_alnum
        |FROM base ORDER BY p_partkey""".stripMargin),
      "F8 paren-suffix strip + F11 isalnum (processing.py:79-84)"),

    // --- F17 point-vs-coordinates consistency -------------------------
    "c6_location_check" -> Q(
      (s, dir) => {
        val c = table(s, dir, "customer")
        val lat = (col("c_custkey") % 90).cast("string")
        val lon = (col("c_custkey") % 180).cast("string")
        val point = when(col("c_custkey") % 5 === 0,
          concat_ws(" ", lon, lat)).otherwise(concat_ws(" ", lat, lon))
        c.select(Clean.locationConsistent(point, lat, lon).as("consistent"))
          .groupBy("consistent").agg(count(lit(1)).as("n"))
          .orderBy("consistent")
      },
      Some("""WITH pts AS (
        |  SELECT CAST(c_custkey % 90 AS VARCHAR) AS lat,
        |    CAST(c_custkey % 180 AS VARCHAR) AS lon,
        |    CASE WHEN c_custkey % 5 = 0
        |      THEN CAST(c_custkey % 180 AS VARCHAR) || ' ' || CAST(c_custkey % 90 AS VARCHAR)
        |      ELSE CAST(c_custkey % 90 AS VARCHAR) || ' ' || CAST(c_custkey % 180 AS VARCHAR)
        |    END AS point
        |  FROM customer)
        |SELECT point = lat || ' ' || lon AS consistent, COUNT(*) AS n
        |FROM pts GROUP BY 1 ORDER BY consistent""".stripMargin),
      "F17 location consistency check (03-data-quality/location.py:26-27)"),

    // --- F18 OSM timestamp format round-trip --------------------------
    "c7_parse_roundtrip" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val iso = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        o.select(col("o_orderpriority"),
            Clean.parseOsmTimestamp(iso).cast("timestamp_ntz").as("ts"))
          .groupBy("o_orderpriority")
          .agg(min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH t AS (
        |  SELECT o_orderpriority,
        |    strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ') AS ts
        |  FROM orders)
        |SELECT o_orderpriority, MIN(ts) AS min_ts, MAX(ts) AS max_ts, COUNT(*) AS n
        |FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "F18 '%Y-%m-%dT%H:%M:%SZ' parse round-trip (README.md:657-658)"),

    // --- S5 Excel serial-date conversion ------------------------------
    "c8_excel_serial" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders").filter(col("o_orderkey") < 1000)
        val serial = lit(30000.0) + (col("o_orderkey") % 10000).cast("double") + lit(0.5)
        o.select(col("o_orderkey"), serial.as("serial"),
            Clean.excelSerialToTimestamp(serial).cast("timestamp_ntz").as("ts"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
        |  30000.0 + CAST(o_orderkey % 10000 AS DOUBLE) + 0.5 AS serial,
        |  epoch_ms(CAST((30000.0 + CAST(o_orderkey % 10000 AS DOUBLE) + 0.5 - 25569) * 86400 AS BIGINT) * 1000) AS ts
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin),
      "S5 Excel serial date → timestamp (01/excel_csv.py:33-41)"),

    // --- F22 filename → (courier, airport) + F6 prefix test -----------
    "c9_courier_parse" -> Q(
      (s, dir) => {
        val sup = table(s, dir, "supplier")
        val couriers = Seq("AA", "UA", "DL", "WN")
        val airports = Seq("SFO", "SJC", "OAK")
        val file = concat(
          element_at(array(couriers.map(lit): _*), (col("s_suppkey") % 4 + 1).cast("int")),
          lit("-"),
          element_at(array(airports.map(lit): _*), (col("s_suppkey") % 3 + 1).cast("int")),
          lit(".html"))
        sup.select(col("s_suppkey"), file.as("file"),
            Clean.courierOf(file).as("courier"),
            Clean.airportOf(file).as("airport"),
            file.startsWith("AA").as("is_aa"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH f AS (
        |  SELECT s_suppkey,
        |    ${sqlList(Seq("AA", "UA", "DL", "WN"))}[CAST(s_suppkey % 4 + 1 AS INT)] || '-' ||
        |    ${sqlList(Seq("SFO", "SJC", "OAK"))}[CAST(s_suppkey % 3 + 1 AS INT)] || '.html' AS file
        |  FROM supplier)
        |SELECT s_suppkey, file,
        |  regexp_extract(file, '([A-Z0-9]{2})-([A-Z]{3})\\.html', 1) AS courier,
        |  regexp_extract(file, '([A-Z0-9]{2})-([A-Z]{3})\\.html', 2) AS airport,
        |  file LIKE 'AA%' AS is_aa
        |FROM f ORDER BY s_suppkey""".stripMargin),
      "F22 filename parse (02/process.py:58) + F6 prefix predicate"),

    // --- F21 comma-grouped int parse ----------------------------------
    "c10_comma_int" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders").filter(col("o_orderkey") < 2000)
        val n = col("o_orderkey") % 900000 + 100
        val s10 = when(n >= 1000,
          concat(floor(n / 1000).cast("long").cast("string"), lit(","),
            lpad(pmod(n, lit(1000)).cast("string"), 3, "0")))
          .otherwise(n.cast("string"))
        o.select(col("o_orderkey"), s10.as("display"),
            Clean.commaInt(s10).as("parsed"))
          .orderBy("o_orderkey")
      },
      Some("""WITH t AS (
        |  SELECT o_orderkey, o_orderkey % 900000 + 100 AS n FROM orders
        |  WHERE o_orderkey < 2000)
        |SELECT o_orderkey,
        |  CASE WHEN n >= 1000
        |    THEN CAST(n // 1000 AS VARCHAR) || ',' || lpad(CAST(n % 1000 AS VARCHAR), 3, '0')
        |    ELSE CAST(n AS VARCHAR) END AS display,
        |  CAST(replace(CASE WHEN n >= 1000
        |    THEN CAST(n // 1000 AS VARCHAR) || ',' || lpad(CAST(n % 1000 AS VARCHAR), 3, '0')
        |    ELSE CAST(n AS VARCHAR) END, ',', '') AS BIGINT) AS parsed
        |FROM t ORDER BY o_orderkey""".stripMargin),
      "F21 de-comma int parse (02/process.py:72-73)"),

    // --- A9 audit-style set collection per extracted key --------------
    "c11_audit_sets" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part")
        p.select(Clean.streetType(col("p_name")).as("last_word"), col("p_brand"))
          .groupBy("last_word")
          .agg(array_join(sort_array(collect_set(col("p_brand"))), ",").as("brands"),
            countDistinct(col("p_brand")).as("n_brands"))
          .orderBy("last_word")
      },
      Some("""WITH d AS (
        |  SELECT DISTINCT regexp_extract(p_name, '(\S+\.?)$', 1) AS last_word, p_brand
        |  FROM part)
        |SELECT last_word, string_agg(p_brand, ',' ORDER BY p_brand) AS brands,
        |  COUNT(*) AS n_brands
        |FROM d GROUP BY last_word ORDER BY last_word""".stripMargin),
      "A9 grouped set-union audit (audit.py:48-70): key → sorted example set"),

    // --- P5 dotted-path predicate on assembled struct -----------------
    "c12_dotted_path" -> Q(
      (s, dir) =>
        table(s, dir, "part")
          .select(col("p_partkey"),
            struct(col("p_size").as("width"), col("p_retailprice").as("height"))
              .as("dimensions"))
          .filter(col("dimensions.width") > 25)
          .select(col("p_partkey"), col("dimensions.width").as("width"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_size AS width FROM part
        |WHERE p_size > 25 ORDER BY p_partkey""".stripMargin),
      "P5 $gt on dotted nested path (04/dot_find.py:18)"),

    // --- P11 find_one(): deterministic first document -----------------
    "c13_find_one" -> Q(
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy(col("o_orderkey").asc)
          .limit(1)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders ORDER BY o_orderkey ASC LIMIT 1""".stripMargin),
      "P11 find_one() pinned deterministic (04/update.py:74)"),

    // --- §2.6 window-function breadth: dense_rank / lead / ntile ------
    "c14_window_breadth" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        table(s, dir, "customer")
          .filter(col("c_custkey") < 300)
          .select(col("c_custkey"), col("c_nationkey"),
            dense_rank().over(w).as("dr"),
            lead(col("c_custkey"), 1).over(w).as("next_custkey"),
            ntile(4).over(w).as("quartile"))
          .orderBy("c_nationkey", "c_custkey")
      },
      Some("""SELECT c_custkey, c_nationkey,
        |  CAST(dense_rank() OVER w AS INT) AS dr,
        |  lead(c_custkey, 1) OVER w AS next_custkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM customer WHERE c_custkey < 300
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_nationkey, c_custkey""".stripMargin),
      "§2.6 dense_rank + lead + ntile (capability beyond reference)"),

    // --- §2.8 intersect ------------------------------------------------
    "c15_intersect" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        val done = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        urgent.intersect(done).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin),
      "§2.8 INTERSECT set op (capability beyond reference)"),

    // --- P6 on ARRAY fields: Mongo $in = array-intersects -------------
    "c16_array_overlap" -> Q(
      (s, dir) =>
        table(s, dir, "part")
          .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
          .filter(arrays_overlap(col("words"), array(lit("red"), lit("ring"))))
          .select(col("p_partkey"), array_join(col("words"), " ").as("name"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name AS name FROM part
        |WHERE list_has_any(string_split(p_name, ' '), ['red', 'ring'])
        |ORDER BY p_partkey""".stripMargin),
      "P6 $in on an array field = arrays_overlap (04/find_cars.py:16 semantics note)"),

    // --- §2.5 extension: ROLLUP hierarchy totals ----------------------
    "c17_rollup" -> Q(
      (s, dir) =>
        table(s, dir, "customer")
          .rollup(col("c_mktsegment"), col("c_nationkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
          .select(
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            coalesce(col("c_nationkey").cast("long"), lit(-1L)).as("nation"),
            col("n"), col("bal"))
          .orderBy("segment", "nation"),
      Some("""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
        |  COALESCE(CAST(c_nationkey AS BIGINT), -1) AS nation,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
        |ORDER BY segment, nation""".stripMargin),
      "§2.5 ROLLUP hierarchy aggregation (capability beyond reference)"),

    // --- exact percentiles (interpolated) ------------------------------
    // Both engines use the same definition (rank p·(n−1), linear
    // interpolation); values are surfaced rounded to 4 decimals to wash
    // out last-bit differences in the interpolation arithmetic.
    "c18_percentiles" -> Q(
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "Exact interpolated percentiles (median/p90) — §2.5 extension"),

    // --- quantile sketch with an error contract ------------------------
    // The scale path when c18's exact percentile (a full sort per group)
    // is too expensive: approx_percentile's sketch guarantees rank error
    // <= n/accuracy. Same oracle trick as x11_hll: the emitted columns
    // are the exact value and the CONTRACT VERDICT — Spark computes the
    // verdict for real (approx median must lie between the exact 48th
    // and 52nd percentiles, a rank window hundreds of times wider than
    // the sketch's guarantee at accuracy=10000), DuckDB emits TRUE.
    "c19_percentile_sketch" -> Q(
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_exact"),
            expr("approx_percentile(o_totalprice, 0.5, 10000)").as("__approx"),
            expr("percentile(o_totalprice, 0.48)").as("__lo"),
            expr("percentile(o_totalprice, 0.52)").as("__hi"))
          .select(col("o_orderpriority"), col("median_exact"),
            (col("__approx") >= col("__lo") &&
              col("__approx") <= col("__hi")).as("sketch_ok"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_exact,
        |  TRUE AS sketch_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "Quantile sketch (approx_percentile) with an oracle-checked rank-error contract"),

    // --- URL canonicalization (web-corpus dedup key) --------------------
    // Dirty URLs constructed deterministically from o_orderkey (mixed-case
    // scheme/host, default and non-default ports, trailing slashes,
    // tracking params, fragments); Clean.canonicalizeUrl collapses the
    // spurious variance and the group-by counts the collapsed keys. The
    // oracle replays the identical RE2-compatible regex steps in DuckDB.
    "c20_url_canonicalize" -> Q(
      (s, dir) => {
        val k = col("o_orderkey")
        val raw = concat(
          element_at(array(lit("HTTP"), lit("https"), lit("http")),
            (k % 3 + 1).cast("int")),
          lit("://"),
          element_at(array(lit("Example.COM"), lit("example.com")),
            (k % 2 + 1).cast("int")),
          element_at(array(lit(":80"), lit(":443"), lit(":8080"), lit("")),
            (k % 4 + 1).cast("int")),
          lit("/Cat/"), (k % 7).cast("string"),
          when(k % 2 === 0, lit("/")).otherwise(lit("")),
          lit("?id="), (k % 20).cast("string"),
          when(k % 3 === 0, lit("&utm_source=mail&b=2&a=1")).otherwise(lit("")),
          when(k % 5 === 0, lit("#frag")).otherwise(lit("")))
        table(s, dir, "orders").filter(k < 2000)
          .select(Clean.canonicalizeUrl(raw).as("url"))
          .groupBy("url").agg(count(lit(1)).as("n"))
          .orderBy("url")
      },
      Some("""WITH raw AS (
        |  SELECT CASE o_orderkey % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'http' END
        |    || '://'
        |    || CASE o_orderkey % 2 WHEN 0 THEN 'Example.COM' ELSE 'example.com' END
        |    || CASE o_orderkey % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END
        |    || '/Cat/' || CAST(o_orderkey % 7 AS VARCHAR)
        |    || CASE WHEN o_orderkey % 2 = 0 THEN '/' ELSE '' END
        |    || '?id=' || CAST(o_orderkey % 20 AS VARCHAR)
        |    || CASE WHEN o_orderkey % 3 = 0 THEN '&utm_source=mail&b=2&a=1' ELSE '' END
        |    || CASE WHEN o_orderkey % 5 = 0 THEN '#frag' ELSE '' END AS u
        |  FROM orders WHERE o_orderkey < 2000),
        |parts AS (
        |  SELECT u,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_replace(regexp_extract(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1), '^[^/?#@]*@', '')) AS hostport,
        |    regexp_extract(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^[^/?#]*([^?#]*)', 1) AS rawpath,
        |    regexp_extract(regexp_replace(u, '#.*$', ''), '\?(.*)', 1) AS q
        |  FROM raw),
        |canon AS (
        |  SELECT scheme || '://' ||
        |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |         ELSE hostport END ||
        |    CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
        |         ELSE regexp_replace(rawpath, '/+$', '') END ||
        |    CASE WHEN ps = '' THEN '' ELSE '?' || ps END AS url
        |  FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(q, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))), '&') AS ps
        |    FROM parts))
        |SELECT url, COUNT(*) AS n FROM canon GROUP BY url ORDER BY url""".stripMargin),
      "URL canonicalization: scheme/host case, default ports, tracking params, " +
        "trailing slashes, fragments collapsed to the web-corpus dedup key")
  )
}
