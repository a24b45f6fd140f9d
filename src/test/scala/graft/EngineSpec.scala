package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.json._
import graft.pipeline.{GsuiteLogin, Ingest}

/** The client surface end-to-end (A23): ingest -> register `events` ->
  * spark.sql of the reference's two published README queries — exactly what
  * a pyathena user of the reference would run, minus the S3/Athena plumbing.
  * Plus gsuite edge coverage the golden fixtures don't reach. */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var eventsDir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    eventsDir = java.nio.file.Files.createTempDirectory("graft_engine").toString + "/events"
    Ingest.ingestBatch(spark, "/root/reference/lambdas/tests/samples/*.json", eventsDir)
    Ingest.eventsTable(spark, eventsDir).createOrReplaceTempView("events")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("driver smoke: SparkEntry.entry returns rows on a vanilla session") {
    // the driver calls entry with its own session and only checks rows > 0
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("README query 1: json_extract_scalar equality predicates + LIMIT") {
    // /root/reference/README.md:89-109, Presto -> Spark SQL translation
    val rows = Engine.sql(spark,
      """SELECT utctimestamp, summary, severity, eventid,
                get_json_object(details, '$.eventname') AS eventname
         FROM events
         WHERE get_json_object(details, '$.eventsource') = 'logs.amazonaws.com'
           AND get_json_object(details, '$.eventname') = 'CreateLogStream'
         LIMIT 100""").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("eventname") == "CreateLogStream")
    assert(rows.head.getAs[String]("utctimestamp") == "2019-09-04T17:54:59+00:00")
  }

  test("README query 2: json_array_contains over _ipaddresses") {
    // /root/reference/README.md:121-136
    val rows = Engine.sql(spark,
      """SELECT get_json_object(details, '$.eventname') AS eventname
         FROM events
         WHERE array_contains(
           from_json(get_json_object(details, '$._ipaddresses'), 'array<string>'),
           '54.21.12.27')
         LIMIT 100""").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "CreateLogStream")
  }

  test("partition columns present and registered via discovery (A22)") {
    val cols = Engine.sql(spark, "SELECT year, month, day, hour FROM events LIMIT 1").collect()
    assert(cols.length == 1)
    assert(cols.head.getString(0).length == 4)
  }

  test("gsuite: is_suspicious=true parameter sets details.suspicious") {
    val meta = JObject("something" -> JString("else"))
    val event = Json.parse(
      """{"source": "x", "tags": [], "severity": "INFO", "summary": "s",
         "category": "c", "utctimestamp": "t", "plugins": [],
         "details": {
           "kind": "admin#reports#activity",
           "id": {"time": "2020-03-02T17:54:33.253Z"},
           "etag": "e",
           "actor": {"email": "a@b.c"},
           "events": [{"name": "login_failure",
             "parameters": [{"name": "is_suspicious", "boolvalue": true}]}]
         }}""").asInstanceOf[JObject]
    val (Some(result), _) = GsuiteLogin.onMessage(event, meta): @unchecked
    val details = result("details").asInstanceOf[JObject]
    assert(details("suspicious") == JBool(true))
    // 'fail' in summary -> success=false
    assert(details("success") == JBool(false))
    assert(result("summary").asInstanceOf[JString].value ==
      "a@b.c login_failure from IP ")
  }
}
