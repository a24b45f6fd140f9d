package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle equivalent over the same parquet tables.
  *
  * Contract notes (driver compare):
  *  - column NAMES must match between `fn`'s result and `oracle` — the driver
  *    sorts columns by name before hashing values;
  *  - types must align: DuckDB `count`/`length`/`row_number`/`year` are
  *    BIGINT, Spark's are INT — cast the narrow side up;
  *  - every query ends in ORDER BY on a key that makes row order unique;
  *  - no raw TIMESTAMP output columns (tz-awareness differs between engines
  *    at the parquet/pandas boundary) — format to string or epoch instead;
  *  - float aggregates are rounded in BOTH engines so IEEE summation-order
  *    differences cannot flip the hash.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Optional DISTRIBUTED stand-in for plan fingerprinting (r17 verdict
      * "what's wrong" #1): queries that legitimately return a LocalRelation
      * (bounded collect-then-localize, e.g. the iterative graph top-20s) or
      * whose sf-dependent empty result lets AQE collapse the executed plan
      * to an EmptyRelation expose the frame whose SHAPE the regression
      * tracker should watch — the pre-collect pipeline. Bench fingerprints
      * this frame (under AQEPropagateEmptyRelation exclusion, so emptiness
      * at a small SF cannot zero the signature) while TIMING the real
      * query unchanged. */
    planProxy: Option[(SparkSession, String) => DataFrame] = None)

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events parquet's `ts` column has shipped in three physical layouts
    * across testdata generations: TIMESTAMP(NANOS) surfaced as LONG (via
    * `spark.sql.legacy.parquet.nanosAsLong=true`), TIMESTAMP(MICROS) without
    * UTC-adjustment surfaced as TIMESTAMP_NTZ (Spark 4.1 default inference),
    * and plain TIMESTAMP. Branch on the scanned dtype so every consumer sees
    * one canonical `ts: TIMESTAMP` regardless of which parquet the driver
    * generated. Sessions pin `spark.sql.session.timeZone=UTC`, so the
    * NTZ→TZ cast is an identity relabel (no wall-clock shift) and matches
    * DuckDB's naive-timestamp reading of the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet dtype $other")
    }
  }

  /** Register testdata tables as temp views for spark.sql-based queries. */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
