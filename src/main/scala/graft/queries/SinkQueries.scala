package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sink/scan parity queries (SURVEY §2B sinks + scans rows).
  *
  * The reference stores events as gzip NDJSON under hour prefixes
  * (`/root/reference/main.tf:608-633`); our at-rest format is partitioned
  * parquet (strictly better: columnar pruning + pushdown), with gzip NDJSON
  * as the compat sink. Both directions are exercised here and checked by
  * the DuckDB oracle reading the SAME files Spark wrote.
  */
object SinkQueries {

  private val NdjsonDir = "/tmp/graft_events_ndjson"

  private var written = false
  private def ensureWritten(events: org.apache.spark.sql.DataFrame): Unit = synchronized {
    if (!written) {
      events
        .select("eventid", "utctimestamp", "severity", "summary", "category", "source", "details")
        .write.mode("overwrite").option("compression", "gzip").json(NdjsonDir)
      written = true // only after a successful write
    }
  }

  /** gzip NDJSON round-trip: events -> .json.gz -> schema-on-read scan.
    * Hadoop codecs handle the gzip on both write and read (A2). */
  private val ndjsonSink = Q(
    "q_sink_ndjson",
    (s, d) => {
      ensureWritten(PipelineQueries.eventsFrame(s))
      s.read.json(NdjsonDir) // schema-on-read over the gzip NDJSON
        .select(
          col("source"), col("category"), col("severity"),
          get_json_object(col("details"), "$.eventname").as("eventname"),
          get_json_object(col("details"), "$.sourceipaddress").as("sourceip"))
        .orderBy(col("source"), coalesce(col("sourceip"), lit("")), coalesce(col("eventname"), lit("")))
    },
    Some(s"""SELECT source, category, severity,
        json_extract_string(details, '$$.eventname') AS eventname,
        json_extract_string(details, '$$.sourceipaddress') AS sourceip
      FROM read_json_auto('$NdjsonDir/*.json.gz')
      ORDER BY source, coalesce(sourceip, ''), coalesce(eventname, '')"""))

  /** Partition pruning over the hour-partitioned events table: the filter on
    * partition columns prunes directories at planning time (Catalyst
    * PruneFileSourcePartitions) — the moral equivalent of the reference's
    * WHERE year=... AND month=... guidance (README.md:98-108), automatic
    * instead of a registration cron. PlansSpec pins the pruned plan. */
  private val partitionPrune = Q(
    "q_scan_partition_prune",
    (s, d) => {
      PipelineQueries.eventsFrame(s)
        .filter(col("year") === date_format(current_date(), "yyyy"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n
      FROM read_parquet('/tmp/graft_events/*/*/*/*/*.parquet', hive_partitioning = true)
      WHERE year = strftime(now(), '%Y')
      GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(ndjsonSink, partitionPrune)
}
