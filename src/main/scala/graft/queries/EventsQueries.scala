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

  val all: Seq[Q] = Seq(jsonExtract, hourlyWindow, distinctRows, perUser, typesPerUser, jsonTuple,
    sessionize, saltedAgg, variantExtract)
}
