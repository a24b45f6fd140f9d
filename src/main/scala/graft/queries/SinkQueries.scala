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

  private val CsvDir = "/tmp/graft_events_csv"

  private var csvWritten = false
  private def ensureCsv(events: org.apache.spark.sql.DataFrame): Unit = synchronized {
    if (!csvWritten) {
      events
        .select(col("eventid"), coalesce(col("source"), lit("(none)")).as("source"),
          coalesce(col("category"), lit("(none)")).as("category"),
          coalesce(col("severity"), lit("(none)")).as("severity"))
        .write.mode("overwrite").option("header", "true").csv(CsvDir)
      csvWritten = true // only after a successful write
    }
  }

  /** CSV round-trip — the remaining interchange format next to parquet and
    * gzip NDJSON: events → header CSV → schema-on-read scan, checked by
    * DuckDB parsing the SAME files Spark wrote (quoting parity is the real
    * test — both sides speak RFC-4180). Group keys are written
    * null-coalesced to a NON-EMPTY sentinel: an empty-string coalesce
    * would be no defense at all, because Spark writes '' as a quoted empty
    * field and DuckDB's read_csv_auto turns quoted empties back into NULL
    * (allow_quoted_nulls default) — the exact null-convention divergence
    * (Spark sorts nulls first, DuckDB last) the coalesce exists to keep
    * out of the compare. A printable sentinel survives the round trip
    * identically in both parsers. */
  private val csvScan = Q(
    "q_scan_csv",
    (s, d) => {
      ensureCsv(PipelineQueries.eventsFrame(s))
      s.read.option("header", "true").csv(CsvDir)
        .groupBy("source", "category", "severity")
        .agg(count(lit(1)).as("n"), countDistinct("eventid").as("n_ids"))
        .orderBy("source", "category", "severity")
    },
    Some(s"""SELECT source, category, severity, count(*) AS n,
        count(DISTINCT eventid) AS n_ids
      FROM read_csv_auto('$CsvDir/*.csv', header = true)
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

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
  // one configured child session per parent (bench runs median-of-3 plus
  // probes; a fresh newSession() per invocation would leak a session
  // per run on the shared SparkContext) — same synchronized-memo pattern
  // as ensureCsv/ensureEvolve
  private val pushdownSessions =
    new java.util.IdentityHashMap[SparkSession, SparkSession]()
  private def pushdownSession(s: SparkSession): SparkSession = synchronized {
    Option(pushdownSessions.get(s)).getOrElse {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.sources.useV1SourceList", "")
      s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      pushdownSessions.put(s, s2)
      s2
    }
  }

  private val aggPushdown = Q(
    "q_scan_agg_pushdown",
    (s, d) => {
      val s2 = pushdownSession(s)
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

  /** Z-order layout audit — the data-skipping arithmetic of
    * [[graft.operators.Zorder]] surfaced in the gate: Morton-interleave
    * (l_partkey, l_suppkey), assign each row to its would-be file by the
    * code's high bits (a contiguous z-interval = a compact rectangle family
    * in key space), and emit per-file min/max zone maps plus whether a
    * fixed box predicate would have to open the file. On the arrival-order
    * layout every file spans the whole key range (every file is a box
    * hit); on the z-layout the hits collapse to the files whose rectangles
    * actually touch the box — the ratio IS the scan savings OPTIMIZE
    * ZORDER buys. One bounded groupBy on the file id (map-side partial);
    * the bit-twiddle is pure column algebra shared with the operator, and
    * the oracle replays the five mask/shift spreads verbatim. The 2^16
    * z-interval per file is the layout dial (the operator's targetFiles);
    * at production key widths it rises with the keyspace. */
  private val zorderLayout = Q(
    "q_maint_zorder",
    (s, d) => {
      val z = graft.operators.Zorder.mortonCode(col("l_partkey"), col("l_suppkey"))
      Tables.t(s, d, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"),
          call_function("shiftright", z, lit(16)).as("file_id"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("p").as("min_p"), max("p").as("max_p"),
          min("sk").as("min_s"), max("sk").as("max_s"))
        .withColumn("box_hit",
          col("min_p") <= 200L && col("max_p") >= 100L &&
            col("min_s") <= 20L && col("max_s") >= 10L)
        .orderBy("file_id")
    },
    Some("""WITH x0 AS (SELECT l_partkey AS p, l_suppkey AS sk,
            (l_partkey & 4294967295) AS sa, (l_suppkey & 4294967295) AS sb FROM lineitem),
      x1 AS (SELECT p, sk, ((sa | (sa << 16)) & 281470681808895) AS sa,
                           ((sb | (sb << 16)) & 281470681808895) AS sb FROM x0),
      x2 AS (SELECT p, sk, ((sa | (sa << 8)) & 71777214294589695) AS sa,
                           ((sb | (sb << 8)) & 71777214294589695) AS sb FROM x1),
      x3 AS (SELECT p, sk, ((sa | (sa << 4)) & 1085102592571150095) AS sa,
                           ((sb | (sb << 4)) & 1085102592571150095) AS sb FROM x2),
      x4 AS (SELECT p, sk, ((sa | (sa << 2)) & 3689348814741910323) AS sa,
                           ((sb | (sb << 2)) & 3689348814741910323) AS sb FROM x3),
      x5 AS (SELECT p, sk, ((sa | (sa << 1)) & 6148914691236517205) AS sa,
                           ((sb | (sb << 1)) & 6148914691236517205) AS sb FROM x4),
      f AS (SELECT p, sk, (sa | (sb << 1)) >> 16 AS file_id FROM x5)
      SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
             min(p) AS min_p, max(p) AS max_p, min(sk) AS min_s, max(sk) AS max_s,
             (min(p) <= 200 AND max(p) >= 100 AND min(sk) <= 20 AND max(sk) >= 10) AS box_hit
      FROM f GROUP BY file_id ORDER BY file_id"""))

  private val EvolveDir = "/tmp/graft_docs_evolve"

  // memo keyed on the dataset dir: the fixture CONTENT depends on d (one
  // JVM runs the gate at sf0.01 and then bench/RunOne at sf0.1 — a bare
  // boolean would silently serve the first dataset's files to the second)
  private var evolveFor: Option[String] = None
  private def ensureEvolve(docs: org.apache.spark.sql.DataFrame, d: String): Unit = synchronized {
    if (!evolveFor.contains(d)) {
      // generation 1: the old writer's schema (no n_chars column)
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
        .write.mode("overwrite").parquet(s"$EvolveDir/v1")
      // generation 2: the widened schema a later writer ships
      docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$EvolveDir/v2")
      evolveFor = Some(d) // only after a successful write
    }
  }

  /** Schema evolution — the lake reality every long-lived table hits: files
    * written before a column existed sit beside files written after.
    * Spark's `mergeSchema` unions the footers and nulls the missing column
    * in old files. The aggregate separates "rows from old files"
    * (n_chars IS NULL) from real data — the count/coalesce discipline any
    * widened-column rollup needs. Schema merge is a FOOTER operation
    * (planning-time, one small read per file), not a data rewrite — the
    * whole point vs. an eager backfill of 100 TB.
    *
    * The oracle derives ground truth from the SOURCE `documents` table
    * (doc_id parity decides which generation a row landed in), the
    * q_scan_orc cross-format-contract pattern, rather than re-reading the
    * fixture files: any value lost or invented anywhere in the
    * write/merge/scan cycle shows as an aggregate mismatch, and the check
    * no longer depends on the shared /tmp fixture path — the r13 10x gate
    * caught the old file-path oracle reading a fixture REBUILT for a
    * different SF by an interleaved Verify run (gate-sequencing artifact,
    * not an engine bug; the source-derived oracle is immune). */
  private val schemaEvolution = Q(
    "q_scan_schema_evolution",
    (s, d) => {
      ensureEvolve(Tables.t(s, d, "documents"), d)
      s.read.option("mergeSchema", "true").parquet(s"$EvolveDir/v1", s"$EvolveDir/v2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(col("n_chars")).as("n_new_schema"),
          sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n,
        CAST(count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS n_new_schema,
        CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang ORDER BY lang"""))

  private val OrcRoot = "/tmp/graft_part_orc"

  private val orcWritten = scala.collection.mutable.Set[String]()
  private def ensureOrc(s: SparkSession, d: String): String = synchronized {
    val dir = s"$OrcRoot/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (!orcWritten.contains(dir)) {
      Tables.t(s, d, "part").write.mode("overwrite").orc(dir)
      orcWritten += dir // only after a successful write
    }
    dir
  }

  /** ORC round-trip — the third columnar interchange format beside parquet
    * and the row formats above: part → ORC (zlib default) → scan →
    * aggregate. DuckDB has no ORC reader, so the oracle computes the SAME
    * aggregate from the SOURCE parquet — a cross-format contract that is
    * STRONGER than same-file parsing parity: any value corrupted anywhere
    * in the ORC write/read cycle (encoding, predicate metadata, decimal
    * rescale) surfaces as an aggregate mismatch. Sums run in exact
    * decimal; the output dir is keyed by sfDir so scale factors never
    * share files. */
  private val orcScan = Q(
    "q_scan_orc",
    (s, d) => {
      val dir = ensureOrc(s, d)
      s.read.orc(dir)
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n"),
          sum(col("p_size").cast("long")).as("sum_size"),
          sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, count(*) AS n,
        CAST(sum(p_size) AS BIGINT) AS sum_size,
        CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM part GROUP BY p_brand ORDER BY p_brand"""))

  /** TABLESAMPLE — Presto `TABLESAMPLE BERNOULLI(10)` / Spark
    * `TABLESAMPLE (10 PERCENT)`, the exploration-time scan dial
    * ("any valid Presto SQL", /root/reference/README.md:116). Sampling is
    * engine-local randomness, so like q_agg_approx_percentile the declared
    * check is the CONTRACT, not the row set: (1) the sampled cardinality
    * lands inside the 6σ binomial band around p·n — each engine replays
    * the band arithmetic from its OWN exact count, and P(outside) ≈ 2e-9
    * at ANY corpus size since the band is computed from n itself; (2) the
    * sample is a SUBSET of the source (left-anti probe must be empty).
    * Spark's PERCENT sampling is per-row Bernoulli on the scan (no
    * pre-count, no global pass — the 100 TB shape); REPEATABLE pins the
    * seed so reruns are stable. DuckDB mirrors with
    * `USING SAMPLE ... (bernoulli, seed)`. The anti-join dedupes nothing
    * and broadcasts nothing big: its build side is the sample itself. */
  private val tablesample = Q(
    "q_scan_tablesample",
    (s, d) => {
      Tables.t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        WITH samp AS (
          SELECT l_orderkey, l_linenumber
          FROM lineitem TABLESAMPLE (10 PERCENT) REPEATABLE (42)),
        tot AS (SELECT count(*) AS n FROM lineitem),
        cnt AS (SELECT count(*) AS k FROM samp),
        miss AS (
          SELECT count(*) AS m FROM samp s
          LEFT ANTI JOIN lineitem l
            ON s.l_orderkey = l.l_orderkey AND s.l_linenumber = l.l_linenumber)
        SELECT tot.n AS n_source,
          cnt.k >= CAST(floor(0.1 * tot.n - 6 * sqrt(0.09 * tot.n)) AS BIGINT) AND
          cnt.k <= CAST(ceil(0.1 * tot.n + 6 * sqrt(0.09 * tot.n)) AS BIGINT) AS in_band,
          miss.m = 0 AS subset_ok
        FROM tot, cnt, miss""")
    },
    Some("""WITH samp AS MATERIALIZED (
        SELECT l_orderkey, l_linenumber
        FROM lineitem USING SAMPLE 10 PERCENT (bernoulli, 42)),
      tot AS (SELECT count(*) AS n FROM lineitem),
      cnt AS (SELECT count(*) AS k FROM samp),
      miss AS (
        SELECT count(*) AS m FROM samp s
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = s.l_orderkey AND l.l_linenumber = s.l_linenumber))
      SELECT CAST(tot.n AS BIGINT) AS n_source,
        cnt.k >= CAST(floor(0.1 * tot.n - 6 * sqrt(0.09 * tot.n)) AS BIGINT) AND
        cnt.k <= CAST(ceil(0.1 * tot.n + 6 * sqrt(0.09 * tot.n)) AS BIGINT) AS in_band,
        miss.m = 0 AS subset_ok
      FROM tot, cnt, miss"""))

  val all: Seq[Q] =
    Seq(ndjsonSink, partitionPrune, aggPushdown, zorderLayout, csvScan, schemaEvolution,
      orcScan, tablesample)
}
