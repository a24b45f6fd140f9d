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
    oracle: Option[String])

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects by default; read nanos as long and convert to micros
    * timestamps once at scan. REQUIRES `spark.sql.legacy.parquet.nanosAsLong
    * =true` at session build (set by Engine.createSession, Verify, Bench and
    * every spec harness). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    t(spark, dir, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register testdata tables as temp views for spark.sql-based queries. */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
