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
    * Spark SQL, parsed/optimized/executed by Catalyst — plus a pre-parse
    * rewrite of Presto's idiomatic array-flattening join (see
    * [[rewriteUnnest]]), which Spark's grammar rejects outright. */
  def sql(spark: SparkSession, query: String): DataFrame =
    spark.sql(rewriteUnnest(query))

  /** Pre-parse rewrite of the SIMPLE Presto `UNNEST` table-reference forms
    * — the most common Athena spellings a migrating reference user types
    * over `details` arrays (README.md:116 "any valid Presto SQL"):
    *
    *   ... CROSS JOIN UNNEST(<expr>) [AS] t(x)        -- array element
    *   ... , UNNEST(<expr>) [AS] t(x)                 -- implicit-join comma form
    *   ... LEFT [OUTER] JOIN UNNEST(<expr>) [AS] t(x) ON TRUE  -- outer flatten
    *   ...                               [AS] t(k, v) -- map entries (any form)
    *
    * become the exact Spark equivalents
    *
    *   ... LATERAL VIEW explode(<expr>) t AS x        (inner: empty/NULL
    *       arrays produce no rows — Presto's CROSS JOIN / comma UNNEST
    *       drop them, as does LATERAL VIEW without OUTER)
    *   ... LATERAL VIEW OUTER explode(<expr>) t AS x  (LEFT ... ON TRUE:
    *       empty/NULL arrays keep the row with NULL columns on both
    *       engines)
    *
    * The scanner is quote-aware (no rewriting inside '...' literals or
    * "..." identifiers) and balances nested parens in <expr>, so
    * function-call arguments rewrite correctly.
    *
    * DOCUMENTED DEVIATION (beside the GROUPS/EXCLUDE notes in
    * GraftExtensions): only the single-argument form rewrites. Presto's
    * multi-array zip form `UNNEST(a, b)` (a top-level comma in the
    * argument) and `WITH ORDINALITY` are left verbatim and fail LOUDLY in
    * Spark's parser — never silently wrong. A LEFT JOIN UNNEST without ON
    * TRUE is likewise left verbatim (Presto itself rejects other ON
    * conditions on an unnest join). EngineSpec pins the rewrites and the
    * loud failures. */
  private[graft] def rewriteUnnest(query: String): String = {
    val n = query.length
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_'
    // end index (exclusive) of the '...' literal or "..." identifier at i
    def skipQuoted(i: Int): Int = {
      val q = query.charAt(i)
      var k = i + 1
      while (k < n) {
        if (query.charAt(k) == q) {
          if (k + 1 < n && query.charAt(k + 1) == q) k += 2 // doubled-quote escape
          else return k + 1
        } else k += 1
      }
      n
    }
    // does the keyword start at i (case-insensitive, word-bounded)?
    def kwAt(i: Int, kw: String): Boolean =
      i + kw.length <= n &&
        query.regionMatches(true, i, kw, 0, kw.length) &&
        (i == 0 || !isIdent(query.charAt(i - 1))) &&
        (i + kw.length == n || !isIdent(query.charAt(i + kw.length)))
    def skipWs(i: Int): Int = { var k = i; while (k < n && query.charAt(k).isWhitespace) k += 1; k }
    def ident(i: Int): Option[(String, Int)] = {
      var k = i
      while (k < n && isIdent(query.charAt(k))) k += 1
      if (k > i && !query.charAt(i).isDigit) Some((query.substring(i, k), k)) else None
    }
    /** Parse `UNNEST ( expr ) [AS] alias ( col [, col] )` starting at the
      * UNNEST keyword; None when the shape is not the simple rewritable
      * form (zip-form top-level comma, WITH ORDINALITY, >2 columns, or a
      * malformed tail). Returns (arg, alias, cols, endIndex). */
    def unnestTail(at: Int): Option[(String, String, Seq[String], Int)] = {
      if (!kwAt(at, "UNNEST")) return None
      var k = skipWs(at + 6)
      if (k >= n || query.charAt(k) != '(') return None
      // balance parens for the argument; reject top-level commas
      // (the multi-array zip form has no explode equivalent)
      val argStart = k + 1
      var depth = 1; var k2 = argStart; var topComma = false
      while (k2 < n && depth > 0) {
        val ch = query.charAt(k2)
        if (ch == '\'' || ch == '"') k2 = skipQuoted(k2)
        else {
          if (ch == '(') depth += 1
          else if (ch == ')') depth -= 1
          else if (ch == ',' && depth == 1) topComma = true
          k2 += 1
        }
      }
      if (depth != 0 || topComma) return None
      val arg = query.substring(argStart, k2 - 1)
      var k3 = skipWs(k2)
      if (kwAt(k3, "WITH")) return None // WITH ORDINALITY: no rewrite
      if (kwAt(k3, "AS")) k3 = skipWs(k3 + 2)
      ident(k3) match {
        case Some((alias, k4)) =>
          val k5 = skipWs(k4)
          if (k5 >= n || query.charAt(k5) != '(') None
          else {
            var k6 = skipWs(k5 + 1)
            val cols = scala.collection.mutable.ArrayBuffer[String]()
            var ok = true; var done = false
            while (ok && !done) {
              ident(k6) match {
                case Some((cn, k7)) =>
                  cols += cn
                  val k8 = skipWs(k7)
                  if (k8 < n && query.charAt(k8) == ',') k6 = skipWs(k8 + 1)
                  else if (k8 < n && query.charAt(k8) == ')') { k6 = k8 + 1; done = true }
                  else ok = false
                case None => ok = false
              }
            }
            if (ok && cols.nonEmpty && cols.size <= 2) Some((arg, alias, cols.toSeq, k6))
            else None
          }
        case None => None
      }
    }
    def lateralView(outer: Boolean, arg: String, alias: String, cols: Seq[String]): String =
      s"LATERAL VIEW ${if (outer) "OUTER " else ""}explode($arg) $alias AS ${cols.mkString(", ")}"
    val out = new StringBuilder
    var i = 0
    while (i < n) {
      val c = query.charAt(i)
      val attempt: Option[(String, Int)] =
        if (c == '\'' || c == '"') None
        else if (c == ',') {
          // implicit-join comma form: `, UNNEST(e) [AS] t(x)` — the comma
          // itself is replaced (LATERAL VIEW attaches without a join)
          unnestTail(skipWs(i + 1)).map { case (arg, alias, cols, end) =>
            (" " + lateralView(outer = false, arg, alias, cols), end)
          }
        } else if (kwAt(i, "CROSS")) {
          val k = skipWs(i + 5)
          if (!kwAt(k, "JOIN")) None
          else unnestTail(skipWs(k + 4)).map { case (arg, alias, cols, end) =>
            (lateralView(outer = false, arg, alias, cols), end)
          }
        } else if (kwAt(i, "LEFT")) {
          var k = skipWs(i + 4)
          if (kwAt(k, "OUTER")) k = skipWs(k + 5)
          if (!kwAt(k, "JOIN")) None
          else unnestTail(skipWs(k + 4)).flatMap { case (arg, alias, cols, end) =>
            // Presto requires ON TRUE on an outer unnest join; anything
            // else is not this form — leave verbatim (loud downstream)
            val k9 = skipWs(end)
            if (!kwAt(k9, "ON")) None
            else {
              val k10 = skipWs(k9 + 2)
              if (!kwAt(k10, "TRUE")) None
              else Some((lateralView(outer = true, arg, alias, cols), k10 + 4))
            }
          }
        } else None
      attempt match {
        case Some((replacement, end)) => out.append(replacement); i = end
        case None =>
          if (c == '\'' || c == '"') {
            val e = skipQuoted(i); out.append(query.substring(i, e)); i = e
          } else { out.append(c); i += 1 }
      }
    }
    out.toString
  }

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
