package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.json._

/** The post-pipeline event shell (SURVEY §1.2; Glue DDL analogue
  * `/root/reference/main.tf:244-288`): fixed 9-column shell + opaque JSON
  * `details` string, partitioned by zero-padded UTC date parts. */
final case class Event(
    eventid: String,
    utctimestamp: String,
    severity: String,
    summary: String,
    category: String,
    source: String,
    tags: Seq[String],
    plugins: Seq[String],
    details: String,
    year: String,
    month: String,
    day: String,
    hour: String)

/** The normalization/enrichment pipeline (processor.py:40-45) and the ingest
  * parse cascade (s3_to_firehose.py:99-126), recomposed Spark-first: the
  * whole S3→Firehose→Lambda→Firehose→S3 chain collapses into one
  * embarrassingly-parallel flatMap — no shuffle anywhere before the
  * partitioned sink write, so ingest scales linearly with input splits. */
object Pipeline {

  /** Registration order mirrors the reference's module listing (alphabetical
    * within a priority; dispatch sort is stable). */
  val normalizationPlugins: Seq[Plugin] =
    Seq(LowercaseKeys, EventShell, GsuiteLogin, IpAddresses, Timestamps)
  val enrichmentPlugins: Seq[Plugin] = Seq(EnsureEventId)

  val defaultMetadata: JObject =
    Helpers.generateMetadata("$LATEST", "arn:none:local:graft", "graft", "1024")

  /** One raw parsed record through normalization then enrichment
    * (processor.py:40-45). None = dropped by a plugin. Throws on a plugin
    * failure — callers decide the ProcessingFailed disposition. */
  def process(raw: JObject, metadata: JObject = defaultMetadata): Option[JObject] = {
    val (normalized, m1) = PluginDispatch.send(raw, metadata, normalizationPlugins)
    normalized.flatMap { n =>
      val (enriched, _) = PluginDispatch.send(n, m1, enrichmentPlugins)
      enriched
    }
  }

  /** Shell JObject -> typed Event row. Partition parts come from ingest time
    * (UTC now), mirroring Firehose's arrival-time YYYY/MM/DD/HH prefixes
    * (main.tf:612-618) — the reference does NOT partition by event time. */
  def toEvent(shell: JObject, now: java.time.LocalDateTime = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)): Event = {
    def str(key: String, default: String = ""): String = shell.get(key) match {
      case Some(JString(s)) => s
      case Some(JNull) | None => default
      case Some(other) => JsonOps.pyStr(other)
    }
    def strings(key: String): Seq[String] = shell.get(key) match {
      case Some(JArray(items)) => items.map(JsonOps.pyStr)
      case _ => Seq.empty
    }
    val details = shell.get("details") match {
      case Some(d) => Json.render(d)
      case None => "{}"
    }
    Event(
      eventid = str("eventid"),
      utctimestamp = str("utctimestamp"),
      severity = str("severity", "INFO"),
      summary = str("summary", "UNKNOWN"),
      category = str("category", "UNKNOWN"),
      source = str("source", "UNKNOWN"),
      tags = strings("tags"),
      plugins = strings("plugins"),
      details = details,
      year = now.getYear.toString,
      month = f"${now.getMonthValue}%02d",
      day = f"${now.getDayOfMonth}%02d",
      hour = f"${now.getHour}%02d")
  }
}

object Ingest {

  /** Parse cascade for one object's content (s3_to_firehose.py:95-126):
    * whole-content JSON parse, else brace-scanner recovery; then `Records[]`
    * unroll / top-level list / single dict, each record tagged with the
    * source classified from the file name (cloudtrail-ish => "cloudtrail",
    * else "s3json"; helpers.py:10-12). Non-object records are skipped (the
    * original would crash the whole file on them — lenient deviation). */
  def rawRecords(fileName: String, content: String): Seq[JObject] = {
    val source = if (Helpers.isCloudtrail(fileName)) "cloudtrail" else "s3json"
    def tag(o: JObject): JObject = o.updated("source", JString(source))

    Json.parseOpt(content) match {
      case None =>
        // not well-formed; recover brace-balanced blocks
        Helpers.emitJsonBlocks(content)
          .filter(_.nonEmpty)
          .flatMap(b => Json.parseOpt(b))
          .collect { case o: JObject => tag(o) }
          .toSeq
      case Some(parsed) =>
        parsed match {
          case o: JObject =>
            o.get("Records") match {
              case Some(JArray(records)) =>
                records.collect { case r: JObject => tag(r) }
              case _ => Seq(tag(o))
            }
          case JArray(items) => items.collect { case r: JObject => tag(r) }
          case _ => Seq.empty
        }
    }
  }

  /** One failed record, preserved for the errors sink: the raw payload plus
    * the failure, mirroring Firehose's ProcessingFailed records landing under
    * the `errors` prefix (`/root/reference/main.tf:618`, processor.py:60-76). */
  final case class FailedRecord(raw: String, error: String, file: String)

  /** One file through cascade + pipeline: events out on the left, plugin
    * failures out on the right (records a plugin DROPPED by returning None
    * are not failures — they disappear by design). */
  def processFileEither(fileName: String, content: String): (Seq[Event], Seq[FailedRecord]) = {
    val events = Vector.newBuilder[Event]
    val failures = Vector.newBuilder[FailedRecord]
    rawRecords(fileName, content).foreach { raw =>
      try Pipeline.process(raw).foreach(sh => events += Pipeline.toEvent(sh))
      catch {
        case e: Exception =>
          failures += FailedRecord(Json.render(raw), s"${e.getClass.getSimpleName}: ${e.getMessage}", fileName)
      }
    }
    (events.result(), failures.result())
  }

  def processFile(fileName: String, content: String): Seq[Event] =
    processFileEither(fileName, content)._1

  /** Batch ingest: landing files -> partitioned parquet events table.
    * wholetext read keeps the cascade's whole-file semantics (A3/A4);
    * .gz inputs decompress transparently via Hadoop codecs (A2). The job is
    * shuffle-free: parse+pipeline run inside one narrow flatMap and the sink
    * is a per-task dynamic partition write. */
  def ingestBatch(spark: SparkSession, inputGlob: String, outDir: String): Unit = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(inputGlob)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .flatMap { case (path, content) => processFile(path, content) }
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year", "month", "day", "hour")
      .parquet(outDir)
  }

  /** Batch ingest with an errors sink: events to partitioned parquet, failed
    * records to NDJSON under `errDir` (the Firehose `error_output_prefix`
    * analogue). Two passes over the (re-read, not cached) input keep both
    * writes single-purpose file scans — inputs are immutable landing files. */
  def ingestBatchWithErrors(spark: SparkSession, inputGlob: String, outDir: String, errDir: String): Unit = {
    import spark.implicits._
    def files = spark.read.option("wholetext", "true").text(inputGlob)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
    files
      .flatMap { case (path, content) => processFileEither(path, content)._1 }
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year", "month", "day", "hour")
      .parquet(outDir)
    files
      .flatMap { case (path, content) => processFileEither(path, content)._2 }
      .write.mode(SaveMode.Overwrite)
      .json(errDir)
  }

  /** Read the ingested events table back (partition discovery replaces the
    * reference's ALTER TABLE ADD PARTITION cron, generate_partitions.py).
    * Partition columns stay strings — the Glue DDL declares year/month/day/
    * hour as string (main.tf:214-232), and zero-padded values ("08") must
    * not collapse to ints. */
  def eventsTable(spark: SparkSession, outDir: String): DataFrame = {
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    spark.read.parquet(outDir)
  }
}
