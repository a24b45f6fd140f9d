package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream monitoring: the hourly-counts → dense spine → rolling
  * z-score pipeline shared by the batch query (`q_events_anomaly`) and the
  * streaming monitor ([[graft.streaming.StreamingIngest.startAnomalyStream]]).
  *
  * The streaming shape: per micro-batch, fold the batch's hourly partial
  * counts into a persisted hourly table (atomic aside+rename swap, replay
  * guarded by the committed batch id stored INSIDE the swapped directory so
  * store content and replay cursor move as one), then re-derive the alerts
  * table from the store alone. The store is types × hours — BOUNDED state
  * that grows by one row per (type, hour) regardless of event volume — so
  * "recompute alerts from the store" is O(store), not O(corpus): the
  * corpus-sized work per batch is exactly one hourly partial aggregate of
  * the delta. That split (O(delta) ingest + bounded-table analytics) is the
  * same lifecycle discipline as the signature stores and vector indexes.
  */
object Monitoring {

  /** Trailing window length (hours) and the |z| > 3 gate, kept integer-exact:
    * with S = Σ and Q = Σ² over the W fully-populated preceding hours,
    * z² > 9 against the trailing population variance rearranges to
    * (W·n − S)² > 9(W·Q − S²) — BIGINT cross-multiplication, no sqrt/float,
    * so batch, stream, and the DuckDB oracle agree bit-for-bit. */
  val WindowHours = 24

  /** Per-type hourly counts of an (event_type, ts) frame — the only
    * corpus-sized stage of the whole pipeline. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))

  /** Gap-fill an (event_type, hr, n, ...) frame to a dense per-type hourly
    * spine over each type's [min, max] hour range: missing hours get n = 0,
    * any extra columns ride along (null in gap rows). Spine cardinality is
    * types × hours — `sequence()` + explode on a types-sized bounds
    * aggregate, independent of event volume. */
  def denseCounts(hourly: DataFrame): DataFrame = {
    val extra = hourly.columns.filterNot(Set("event_type", "hr", "n")).toSeq
    val spine = hourly.groupBy("event_type")
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr"))
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .select((Seq(col("event_type"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n")) ++ extra.map(col)): _*)
  }

  /** Rolling z-score anomaly gate over an (event_type, hr, n) hourly frame:
    * flags hours whose count deviates more than 3 trailing standard
    * deviations from the previous [[WindowHours]] fully-populated hours of
    * the dense spine. Output: (event_type, hr, n, expected). */
  def anomalies(hourly: DataFrame): DataFrame = {
    val W = WindowHours
    val w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-W, -1)
    denseCounts(hourly.select("event_type", "hr", "n"))
      .select(col("event_type"), col("hr"), col("n"),
        count(lit(1)).over(w).as("w_cnt"),
        sum("n").over(w).as("s"),
        sum(col("n") * col("n")).over(w).as("q"))
      .filter(col("w_cnt") === W &&
        (lit(W) * col("n") - col("s")) * (lit(W) * col("n") - col("s")) >
          lit(9) * (lit(W) * col("q") - col("s") * col("s")))
      .select(col("event_type"), col("hr"), col("n"),
        expr(s"s div $W").as("expected"))
  }

  // ---- persisted hourly store ----------------------------------------

  // store plumbing lives in [[StoreCommit]] (shared swap/recover/cursor)
  private def fsOf(spark: SparkSession, dir: Path) = StoreCommit.fsOf(spark, dir)
  private def committedBatch(fs: FileSystem, dir: Path) = StoreCommit.committedBatch(fs, dir)
  private def writeMeta(fs: FileSystem, dir: Path, batchId: Long) = StoreCommit.writeMeta(fs, dir, batchId)
  private def atomicSwap(fs: FileSystem, dir: Path, tmp: Path) = StoreCommit.swap(fs, dir, tmp)

  /** The live hourly table (empty frame if nothing committed yet). */
  def readHourly(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = new Path(s"$storeDir/hourly")
    val fs = fsOf(spark, dir)
    val src = StoreCommit.readableRoot(fs, dir) // non-mutating: see StoreCommit
    if (fs.exists(src)) spark.read.parquet(src.toString)
    else spark.range(0).select(
      lit("").as("event_type"), lit(null).cast("timestamp").as("hr"), lit(0L).as("n"))
  }

  /** Fold one micro-batch of (event_type, ts) events into the stored hourly
    * table. Replay-safe: a batch id at or below the committed cursor (stored
    * inside the swapped directory, so cursor and content are one atomic
    * unit) is a crash replay and folds nothing. */
  def updateHourly(
      spark: SparkSession, batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    val dir = new Path(s"$storeDir/hourly")
    val fs = fsOf(spark, dir)
    if (batchId <= committedBatch(fs, dir)) return // replay: already folded
    val merged = readHourly(spark, storeDir)
      .unionByName(hourlyCounts(batch))
      .groupBy("event_type", "hr").agg(sum("n").as("n"))
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    merged.coalesce(1).write.parquet(tmp.toString)
    writeMeta(fs, tmp, batchId)
    atomicSwap(fs, dir, tmp)
  }

  /** Re-derive and atomically publish the alerts table from the stored
    * hourly counts — idempotent by construction (pure function of the
    * store), so it needs no replay cursor. */
  def publishAlerts(spark: SparkSession, storeDir: String): Unit = {
    val dir = new Path(s"$storeDir/alerts")
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    anomalies(readHourly(spark, storeDir)).coalesce(1).write.parquet(tmp.toString)
    atomicSwap(fs, dir, tmp)
  }

  /** The live alerts table. */
  def readAlerts(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = new Path(s"$storeDir/alerts")
    spark.read.parquet(
      StoreCommit.readableRoot(fsOf(spark, dir), dir).toString) // non-mutating
  }
}
