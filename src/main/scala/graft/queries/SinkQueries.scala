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

  /** Parquet aggregate pushdown — the scan-level endgame of the pruning
    * family: an unfiltered COUNT/MIN/MAX resolves from parquet FOOTER
    * statistics (row-group counts + column min/max), so the scan reads
    * metadata pages instead of data — at 100 TB the difference between a
    * cluster-wide table pass and a file-listing-sized planning step. The
    * capability lives in the V2 parquet reader behind
    * `spark.sql.parquet.aggregatePushdown`; both switches are set on an
    * ISOLATED `newSession()` (shared SparkContext, private SQLConf) so the
    * rest of the corpus keeps its pinned V1 plan shapes. MIN/MAX target
    * integer keys — footer stats for them are exact by format contract.
    * PlansSpec pins `PushedAggregation` in the scan node. */
  private val aggPushdown = Q(
    "q_scan_agg_pushdown",
    (s, d) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.sources.useV1SourceList", "")
      s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      Tables.t(s2, d, "lineitem")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"),
          min(col("l_linenumber")).cast("long").as("min_line"),
          max(col("l_linenumber")).cast("long").as("max_line"))
    },
    Some("""SELECT count(*) AS n_rows,
        min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        CAST(min(l_linenumber) AS BIGINT) AS min_line,
        CAST(max(l_linenumber) AS BIGINT) AS max_line
      FROM lineitem"""))

  val all: Seq[Q] = Seq(ndjsonSink, partitionPrune, aggPushdown)
}
