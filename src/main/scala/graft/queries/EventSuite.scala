package graft.queries

import org.apache.spark.sql.functions._

import graft.Graft.table

/** Batch queries over the `events` table (timestamps, JSON props,
  * sessionization-style windows). The same aggregations are reused by
  * the Structured Streaming surface in graft.streaming.EventStream.
  */
object EventSuite {

  val queries: Map[String, Q] = Map(

    // --- tumbling-window (hourly) aggregation -------------------------
    "e1_hourly_rollup" -> Q(
      (s, dir) =>
        table(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      "Tumbling hourly rollup — batch twin of the streaming window agg"),

    // --- JSON prop extraction (§2.11 surface) -------------------------
    "e2_json_props" -> Q(
      (s, dir) =>
        table(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(pmod(col("k"), lit(10L)).as("k_mod"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
          .orderBy("k_mod"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin),
      "§2.11 JSON path extraction (get_json_object) + modular bucketing"),

    // --- per-user session-ish stats (event sequences) -----------------
    "e3_user_activity" -> Q(
      (s, dir) =>
        table(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"),
            min(col("ts")).as("first_ts"),
            max(col("ts")).as("last_ts"))
          .withColumn("span_minutes",
            ((graft.functions.Clean.epochMillis(col("last_ts")) -
              graft.functions.Clean.epochMillis(col("first_ts"))) / lit(60000.0)))
          .orderBy("user_id"),
      Some("""SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
        |  MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
        |  (epoch_ms(MAX(CAST(ts AS TIMESTAMP))) - epoch_ms(MIN(CAST(ts AS TIMESTAMP)))) / 60000.0 AS span_minutes
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      "Per-user activity span: min/max timestamps + distinct event types"),

    // --- batch sessionization (streaming session_window twin) ---------
    // Spark side uses the REAL session_window aggregation (same operator
    // the Structured Streaming surface uses); the oracle rebuilds the
    // identical sessions with classic gaps-and-islands SQL. Break
    // condition: gap >= 30 minutes (session end is exclusive).
    "e4_sessionize" -> Q(
      (s, dir) =>
        table(s, dir, "events")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("sw.start").cast("timestamp_ntz").as("session_start"),
            col("n_events"))
          .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, SUM(brk) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM d)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin),
      "Batch sessionization via session_window (30-min gap), gaps-and-islands oracle"),

    // --- pivot: event_type counts as columns --------------------------
    "e5_pivot" -> Q(
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        table(s, dir, "events")
          .groupBy(pmod(col("user_id"), lit(10L)).as("cohort"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .select(col("cohort") +:
            types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("cohort")
      },
      Some("""SELECT user_id % 10 AS cohort,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin),
      "Pivot with explicit value list (deterministic columns) — §2.5 extension"),

    // --- as-of join (clicks ← latest prior purchase per user) ---------
    "e6_asof_join" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "value")
        graft.operators.Joins.asOf(clicks, purchases, "user_id", "ts",
            Seq("ts", "value"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_ts"), col("asof_value"))
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id, c.ts, p.ts AS asof_ts, p.value AS asof_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY event_id""".stripMargin),
      "Backward as-of join (union + keyed window carry-forward) vs native ASOF oracle"),

    // --- range join (events ↦ overlapping irregular windows) ----------
    "e7_range_join" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
        // 10 irregular 40-hour windows every 67 hours from 2024-01-01
        val base = 1704067200L // 2024-01-01T00:00:00Z epoch seconds
        val iv = s.range(0, 10).select(
          col("id").as("window_id"),
          timestamp_seconds(lit(base) + col("id") * (67L * 3600))
            .cast("timestamp_ntz").as("ws"),
          timestamp_seconds(lit(base) + col("id") * (67L * 3600) + 40L * 3600)
            .cast("timestamp_ntz").as("we"))
        graft.operators.Joins.rangeJoinByBucket(
            ev.select("event_id", "ts", "value"), iv,
            "ts", "ws", "we", bucketMs = 24L * 3600 * 1000)
          .groupBy("window_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .orderBy("window_id")
      },
      Some("""WITH iv AS (
        |  SELECT t AS window_id,
        |    epoch_ms((1704067200 + t * 67 * 3600) * 1000) AS ws,
        |    epoch_ms((1704067200 + t * 67 * 3600 + 40 * 3600) * 1000) AS we
        |  FROM (SELECT unnest(range(0, 10)) AS t))
        |SELECT window_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM iv JOIN events e
        |  ON CAST(e.ts AS TIMESTAMP) >= ws AND CAST(e.ts AS TIMESTAMP) < we
        |GROUP BY window_id ORDER BY window_id""".stripMargin),
      "Interval-containment join via time-bucket equi-join (scalable range-join shape)"),

    // --- stream-stream interval join, batch twin ----------------------
    // The SAME EventStream.viewToPurchase runs as a watermarked
    // stream-stream join (StreamingMultimodalSpec asserts stream ==
    // batch); declared here in batch form so the pairing itself is
    // DuckDB-oracled: per user, the (view, purchase<=1h later) pair
    // count and the fastest view→purchase lag.
    "e8_view_to_purchase" -> Q(
      (s, dir) => {
        val pairs = graft.streaming.EventStream.viewToPurchase(
          table(s, dir, "events"))
        pairs.groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"),
            min(graft.functions.Clean.epochMillis(col("buy_ts")) -
              graft.functions.Clean.epochMillis(col("view_ts"))).as("min_lag_ms"))
          .orderBy("user_id")
      },
      Some("""SELECT v.user_id, COUNT(*) AS n_pairs,
        |  MIN(epoch_ms(CAST(b.ts AS TIMESTAMP)) - epoch_ms(CAST(v.ts AS TIMESTAMP))) AS min_lag_ms
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') b
        |  ON b.user_id = v.user_id
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin),
      "Per-user view→purchase funnel pairs within 1 h (stream-stream interval-join twin)"),

    // --- document-feed ingest, batch twin -----------------------------
    // The SAME DocStream.enrich column expressions run on the streaming
    // crawl feed (StreamingMultimodalSpec asserts stream == batch);
    // declared here through DocStream.cleanFeedBatch so the feed's
    // enrichment (content fingerprint, token count, quality score,
    // id-derived event time) AND its exact dedup semantics sit under
    // the DuckDB oracle gate. Quality aggregates use MIN/MAX only —
    // order-independent, so the raw computed doubles hash-match.
    "e9_docfeed_clean" -> Q(
      (s, dir) => {
        val feed = table(s, dir, "documents")
        val cleaned = graft.streaming.DocStream.cleanFeedBatch(feed)
        cleaned.groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            min(col("quality")).as("min_quality"),
            max(col("quality")).as("max_quality"),
            min(col("ts")).cast("long").as("first_arrival_s"))
          .join(feed.groupBy("lang").agg(count(lit(1)).as("n_raw")), Seq("lang"))
          .select(col("lang"), col("n_raw"), col("n_docs"),
            (col("n_raw") - col("n_docs")).as("n_dups_dropped"),
            col("total_tokens"), col("min_quality"), col("max_quality"),
            col("first_arrival_s"))
          .orderBy("lang")
      },
      Some {
        // mirrors of Text.tokens / stopwordCount / punctCount /
        // qualityScore — identical arithmetic and parenthesization
        val toks = "string_split_regex(trim(text), '\\s+')"
        val nStop = s"len(list_filter($toks, t -> t IN (" +
          graft.functions.Text.stopwords.map(w => s"'$w'").mkString(",") + ")))"
        val nPunct = "(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))"
        s"""WITH f AS (
        |  SELECT doc_id, lang, text,
        |    1577836800 + doc_id AS arr_s,
        |    row_number() OVER (
        |      PARTITION BY md5(lang || text) ORDER BY doc_id ASC) AS rn
        |  FROM documents),
        |c AS (
        |  SELECT lang, text, arr_s,
        |    len($toks) AS n_tok, $nStop AS n_stop, $nPunct AS n_punct
        |  FROM f WHERE rn = 1),
        |q AS (
        |  SELECT lang, arr_s, n_tok,
        |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.5 +
        |     least(CAST(n_stop AS DOUBLE) * 4.0 / CAST(greatest(n_tok, 1) AS DOUBLE), 1.0) * 0.5)
        |    * (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) * 4.0, 1.0)) AS quality
        |  FROM c),
        |raw AS (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY lang)
        |SELECT q.lang, raw.n_raw, COUNT(*) AS n_docs,
        |  CAST(raw.n_raw - COUNT(*) AS BIGINT) AS n_dups_dropped,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |  MIN(quality) AS min_quality,
        |  MAX(quality) AS max_quality,
        |  CAST(MIN(arr_s) AS BIGINT) AS first_arrival_s
        |FROM q JOIN raw ON raw.lang = q.lang
        |GROUP BY q.lang, raw.n_raw ORDER BY q.lang""".stripMargin
      },
      "Document-feed ingest twin: DocStream enrichment (fingerprint, " +
        "tokens, quality, event time) + earliest-arrival exact dedup, " +
        "per-language rollup"),

    // --- ordered funnel (view → click → purchase) ----------------------
    // Classic sequential-funnel analytics with STRICT ordering: per
    // user, the first view, then the first click strictly after it,
    // then the first purchase strictly after that — three min-
    // aggregations chained by time predicates (each is a partial-
    // aggregating groupBy + same-key join, so the whole funnel shuffles
    // on user_id once per stage and nothing is quadratic). stage =
    // 1..3 is how far the user got.
    "e10_funnel" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .select("user_id", "event_type", "ts")
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .join(views, "user_id")
          .filter(col("ts") > col("view_ts"))
          .groupBy("user_id").agg(min(col("ts")).as("click_ts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .join(clicks, "user_id")
          .filter(col("ts") > col("click_ts"))
          .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
        views
          .join(clicks.select("user_id", "click_ts"), Seq("user_id"), "left")
          .join(buys.select("user_id", "purchase_ts"), Seq("user_id"), "left")
          .select(col("user_id"), col("view_ts"), col("click_ts"),
            col("purchase_ts"),
            (lit(1) + when(col("click_ts").isNotNull, 1).otherwise(0)
              + when(col("purchase_ts").isNotNull, 1).otherwise(0))
              .cast("int").as("stage"))
          .orderBy("user_id")
      },
      Some("""WITH v AS (
        |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS view_ts
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS click_ts
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.view_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS purchase_ts
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.click_ts
        |  GROUP BY e.user_id)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |  CAST(1 + CASE WHEN c.click_ts IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN p.purchase_ts IS NULL THEN 0 ELSE 1 END AS INT)
        |    AS stage
        |FROM v
        |LEFT JOIN c ON c.user_id = v.user_id
        |LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin),
      "Strict-order funnel view→click→purchase: chained first-match " +
        "min-aggregations, per-stage user_id shuffles only"),

    // --- cohort retention ----------------------------------------------
    // The standard product-analytics matrix: users cohorted by their
    // first-event day, retention = distinct users active exactly
    // `day_offset` days later, as a fraction of cohort size. Two
    // partial-aggregating groupBys (first-day per user, then
    // (cohort, offset)) and one user_id equi-join — every shuffle keyed,
    // nothing quadratic, cohort table broadcastable at any event scale.
    "e11_cohort_retention" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val firstDay = ev.groupBy("user_id")
          .agg(min(col("d")).as("cohort_d"))
        val cohortSize = firstDay.groupBy("cohort_d")
          .agg(count(lit(1)).as("cohort_size"))
        val act = ev.distinct()
        act.join(firstDay, Seq("user_id"))
          .groupBy(col("cohort_d"),
            datediff(col("d"), col("cohort_d")).cast("long").as("day_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
          .join(cohortSize, Seq("cohort_d"))
          .select(col("cohort_d"), col("day_offset"), col("n_users"),
            col("cohort_size"),
            (col("n_users").cast("double") /
              col("cohort_size").cast("double")).as("retention"))
          .orderBy("cohort_d", "day_offset")
      },
      Some("""WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |fd AS (SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY user_id),
        |cs AS (SELECT cohort_d, COUNT(*) AS cohort_size FROM fd GROUP BY cohort_d),
        |act AS (SELECT DISTINCT user_id, d FROM ev),
        |r AS (
        |  SELECT f.cohort_d,
        |    CAST(date_diff('day', f.cohort_d, a.d) AS BIGINT) AS day_offset,
        |    COUNT(DISTINCT a.user_id) AS n_users
        |  FROM act a JOIN fd f USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT r.cohort_d, r.day_offset,
        |  CAST(r.n_users AS BIGINT) AS n_users,
        |  CAST(cs.cohort_size AS BIGINT) AS cohort_size,
        |  CAST(r.n_users AS DOUBLE) / CAST(cs.cohort_size AS DOUBLE) AS retention
        |FROM r JOIN cs USING (cohort_d)
        |ORDER BY cohort_d, day_offset""".stripMargin),
      "Cohort retention matrix: first-event-day cohorts x day offset, " +
        "distinct-active over cohort size")
  )
}
