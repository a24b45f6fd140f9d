package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dates, Ingest, Net}
import graft.json.{JLong, JString}

/** End-to-end pipeline slice (SURVEY §7 step 4) + the reference's two
  * published README queries + the UDF surface.
  *
  * The five reference sample fixtures are ingested through the full parse
  * cascade -> plugin pipeline -> partitioned parquet path, then queried with
  * the Spark translations of the Athena/Presto originals
  * (`/root/reference/README.md:89-136`). The DuckDB oracle reads the SAME
  * written parquet, so the check covers the whole pipeline, not just the
  * query. Non-deterministic fields (uuid eventid, processing timestamps,
  * arrival-time partitions) are simply never selected.
  */
object PipelineQueries {

  private val SamplesGlob = "/root/reference/lambdas/tests/samples/*.json"
  private val EventsDir = "/tmp/graft_events"

  // once per JVM: Verify/Bench run many queries over the same ingest output.
  // Synchronized, and marked done only AFTER a successful write — a CAS
  // flipped before the write would let a concurrent reader see a missing or
  // partial table, and a failed ingest would poison every later query.
  private var ingested = false
  private def ensureIngested(s: SparkSession): Unit = synchronized {
    if (!ingested) {
      Ingest.ingestBatch(s, SamplesGlob, EventsDir)
      ingested = true
    }
  }

  /** The ingested events table (runs the sample ingest on first use). */
  private[queries] def eventsFrame(s: SparkSession): DataFrame = {
    ensureIngested(s)
    Ingest.eventsTable(s, EventsDir)
  }
  private def events(s: SparkSession): DataFrame = eventsFrame(s)

  /** Whole-pipeline smoke over all 5 samples: shell fields + JSON-extracted
    * details, deterministic output only. */
  private val pipelineEvents = Q(
    "q_pipeline_events",
    (s, d) =>
      events(s)
        .select(
          col("source"), col("category"), col("severity"), col("summary"),
          get_json_object(col("details"), "$.eventname").as("eventname"),
          get_json_object(col("details"), "$.sourceipaddress").as("sourceip"),
          array_join(col("tags"), ",").as("tags_csv"),
          array_join(col("plugins"), ",").as("plugins_csv"))
        // coalesce the nullable sort keys: Spark ASC is NULLS FIRST, DuckDB
        // defaults NULLS LAST — empty-string coalescing makes them agree
        .orderBy(col("source"), coalesce(col("sourceip"), lit("")), coalesce(col("eventname"), lit(""))),
    Some(s"""SELECT source, category, severity, summary,
        json_extract_string(details, '$$.eventname') AS eventname,
        json_extract_string(details, '$$.sourceipaddress') AS sourceip,
        coalesce(array_to_string(tags, ','), '') AS tags_csv,
        coalesce(array_to_string(plugins, ','), '') AS plugins_csv
      FROM read_parquet('$EventsDir/*/*/*/*/*.parquet')
      ORDER BY source, coalesce(sourceip, ''), coalesce(eventname, '')"""))

  /** README query 1 (`README.md:89-109`): equality predicates over
    * json_extract_scalar'd details. `get_json_object` is the Spark twin. */
  private val readme1 = Q(
    "q_pipeline_readme1",
    (s, d) =>
      events(s)
        .filter(get_json_object(col("details"), "$.eventname") === "CreateLogStream")
        .select(
          col("source"), col("severity"),
          get_json_object(col("details"), "$.eventsource").as("eventsource"),
          get_json_object(col("details"), "$.eventname").as("eventname"),
          get_json_object(col("details"), "$.sourceipaddress").as("sourceip"))
        .orderBy("sourceip")
        .limit(100),
    Some(s"""SELECT source, severity,
        json_extract_string(details, '$$.eventsource') AS eventsource,
        json_extract_string(details, '$$.eventname') AS eventname,
        json_extract_string(details, '$$.sourceipaddress') AS sourceip
      FROM read_parquet('$EventsDir/*/*/*/*/*.parquet')
      WHERE json_extract_string(details, '$$.eventname') = 'CreateLogStream'
      ORDER BY sourceip LIMIT 100"""))

  /** README query 2 (`README.md:121-136`): json_array_contains over the
    * pipeline-built `_ipaddresses` list. Spark: from_json to array + contains. */
  private val readme2 = Q(
    "q_pipeline_readme2",
    (s, d) =>
      events(s)
        .filter(array_contains(
          from_json(get_json_object(col("details"), "$._ipaddresses"),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
          "54.21.12.27"))
        .select(
          col("source"),
          get_json_object(col("details"), "$.eventname").as("eventname"),
          get_json_object(col("details"), "$._ipaddresses").as("ipaddresses"))
        .orderBy("eventname"),
    Some(s"""SELECT source,
        json_extract_string(details, '$$.eventname') AS eventname,
        CAST(json_extract(details, '$$._ipaddresses') AS VARCHAR) AS ipaddresses
      FROM read_parquet('$EventsDir/*/*/*/*/*.parquet')
      WHERE json_contains(json_extract(details, '$$._ipaddresses'), '"54.21.12.27"')
      ORDER BY eventname"""))

  /** `is_ip` as a registered SQL UDF (SURVEY §2B UDF surface), checked
    * against ground truth the oracle can compute arithmetically: synthetic
    * dotted quads are valid iff both variable octets are < 256. */
  private val udfIsIp = Q(
    "q_udf_is_ip",
    (s, d) => {
      s.udf.register("is_ip", (ip: String) => Net.isIp(ip))
      Tables.views(s, d, "lineitem")
      s.sql("""SELECT is_ip(concat(l_orderkey % 300, '.', l_partkey % 300, '.0.1')) AS valid,
                      count(*) AS n
               FROM lineitem GROUP BY 1 ORDER BY valid""")
    },
    Some("""SELECT (l_orderkey % 300 < 256 AND l_partkey % 300 < 256) AS valid, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY valid"""))

  /** `to_utc_any` as a registered SQL UDF: the reference's fuzzy epoch
    * coercion (dates.py magnitude rules) applied to 10-digit epoch seconds,
    * checked against DuckDB's native epoch conversion. */
  private val udfToUtc = Q(
    "q_udf_to_utc",
    (s, d) => {
      s.udf.register("to_utc_any", (v: Long) => Dates.isoformat(Dates.toUTC(JLong(v))))
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderkey,
                      to_utc_any(CAST(unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
                                 + 1000000000) AS utc_iso
               FROM orders ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey,
        strftime(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT) + 1000000000),
                 '%Y-%m-%dT%H:%M:%S+00:00') AS utc_iso
      FROM orders ORDER BY o_orderkey"""))

  /** `to_utc_any` over strings too (the dateutil-fuzzy path): format a date
    * string and run it through the fuzzy parser. */
  private val udfToUtcFuzzy = Q(
    "q_udf_to_utc_fuzzy",
    (s, d) => {
      s.udf.register("to_utc_str", (v: String) => Dates.isoformat(Dates.toUTC(JString(v))))
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderkey,
                      to_utc_str(date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')) AS utc_iso
               FROM orders ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey,
        strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S+00:00') AS utc_iso
      FROM orders ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(pipelineEvents, readme1, readme2, udfIsIp, udfToUtc, udfToUtcFuzzy)
}
