package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The client surface: what pyathena + the Athena/Glue table were to the
  * reference (`/root/reference/lambdas/utils/athena.py`, `README.md:141-185`),
  * `spark.sql` over a registered `events` view is to this engine. The whole
  * start-query/poll/fetch-CSV client layer collapses into one call that
  * returns a DataFrame (A23); partition registration (A22,
  * `generate_partitions.py`) collapses into parquet partition discovery.
  */
object Engine {

  /** Session tuned for the target deployment shape: AQE re-plans skew and
    * partition counts at runtime; 64 MB broadcast threshold catches dimension
    * tables; shuffle partitions sized to the local harness (a real cluster
    * overrides via spark.sql.adaptive.coalescePartitions). */
  def createSession(appName: String = "graft", master: String = "local[32]"): SparkSession =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()

  /** Register the ingested events table for SQL access. Partition discovery
    * happens at read (no ALTER TABLE cron); partition columns stay strings
    * per the reference DDL. */
  def registerEvents(spark: SparkSession, eventsDir: String, viewName: String = "events"): Unit =
    graft.pipeline.Ingest.eventsTable(spark, eventsDir).createOrReplaceTempView(viewName)

  /** "Queries can be any valid Presto SQL" (README.md:116) -> any valid
    * Spark SQL, parsed/optimized/executed by Catalyst. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Full reference-client compatibility: register the events table under
    * the reference's own catalog name (`"defenda_data_lake"."events"`,
    * README.md:94) as an external partitioned table, so the README queries
    * run VERBATIM — double-quoted identifiers need
    * `spark.sql.ansi.doubleQuotedIdentifiers=true`, and the
    * json_extract_scalar/json_extract/json_array_contains functions come
    * from [[graft.functions.GraftExtensions]]. `MSCK REPAIR` is the exact
    * Spark analogue of the reference's partition-registration cron
    * (generate_partitions.py) — run once per registration, not per hour. */
  def registerReferenceCatalog(spark: SparkSession, eventsDir: String): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS defenda_data_lake")
    spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
    spark.sql(s"""CREATE TABLE defenda_data_lake.events (
        eventid STRING, utctimestamp STRING, severity STRING, summary STRING,
        category STRING, source STRING, tags ARRAY<STRING>,
        plugins ARRAY<STRING>, details STRING)
      USING parquet
      PARTITIONED BY (year STRING, month STRING, day STRING, hour STRING)
      LOCATION '$eventsDir'""")
    spark.sql("MSCK REPAIR TABLE defenda_data_lake.events")
  }
}
