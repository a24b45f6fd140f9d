package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming data-quality ledger — the live twin of the batch constraint
  * audit (`q_profile_constraints`): per-row constraint violations are
  * ADDITIVE counters, so each micro-batch folds its one-row violation
  * aggregate into a persisted (constraint, violations, n_rows) ledger and
  * the cumulative ledger after any number of batches equals the one-shot
  * audit over their union bit-for-bit (pinned in StreamingSpec) — the same
  * linearity argument as the count-min store. Per-batch cost: one O(delta)
  * conditional-sum aggregate; ledger state is |rules| rows forever.
  *
  * The uniqueness rule is deliberately NOT in the streaming rule set: it is
  * not mergeable without persisting the key universe (unbounded state).
  * Cross-batch duplicate defense belongs to the ingest pipeline's dedup
  * watermark + [[ReplayGuard]]; the exact uniqueness audit stays in the
  * batch query, which shares [[eventRules]] so the two surfaces can never
  * drift on the additive rules.
  */
object DataQuality {

  /** Additive per-row rules over the events frame: name → VIOLATION
    * predicate (true = row violates). Shared verbatim by the batch audit
    * and the streaming ledger. */
  val eventRules: Seq[(String, Column)] = Seq(
    "event_id_not_null" -> col("event_id").isNull,
    "event_type_in_domain" ->
      !col("event_type").isin("click", "view", "purchase", "error", "login"),
    "props_has_k" -> get_json_object(col("props"), "$.k").isNull,
    "value_non_negative" -> (col("value") < 0))

  /** One-row wide violation aggregate of a batch: n_rows + one violation
    * count per rule — a single map-side-partial pass over the delta. The
    * sums are zero-coalesced: over an EMPTY batch (streams deliver them —
    * recovery no-data batches, triggers firing before files land)
    * `sum(when(...))` is NULL, and a NULL folded into the ledger would turn
    * `passed` into NULL — a gate that neither passes nor blocks. */
  def violationWide(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      eventRules.map { case (n, p) =>
        coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(n)
      }: _*)

  /** Long form: (constraint, violations, n_rows), one row per rule. */
  def violationCounts(df: DataFrame): DataFrame = {
    val stackExpr = eventRules.map { case (n, _) => s"'$n', $n" }
      .mkString(s"stack(${eventRules.size}, ", ", ", ") AS (constraint, violations)")
    violationWide(df).select(expr(stackExpr), col("n_rows"))
  }

  // --- persisted ledger ([[StoreCommit]] discipline) ---

  /** The stored ledger: (constraint, violations, n_rows); empty before the
    * first fold. Recovers a crash-windowed swap before reading. */
  def readLedger(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = new Path(s"$storeDir/ledger")
    val fs = StoreCommit.fsOf(spark, dir)
    StoreCommit.recover(fs, dir)
    if (fs.exists(dir)) spark.read.parquet(dir.toString)
    else spark.range(0).select(lit("").as("constraint"),
      lit(0L).as("violations"), lit(0L).as("n_rows"))
  }

  /** Fold one micro-batch into the stored ledger. Counters are additive, so
    * ledger-after-N-batches == one-shot audit of the union, exactly.
    * Replay-safe: the committed batch id swaps atomically with the ledger
    * content, so a crash-replayed batch folds zero times. */
  def updateStoredLedger(
      spark: SparkSession, batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    val dir = new Path(s"$storeDir/ledger")
    val fs = StoreCommit.fsOf(spark, dir)
    if (batchId <= StoreCommit.committedBatch(fs, dir)) return // replay: already folded
    val merged = readLedger(spark, storeDir)
      .unionByName(violationCounts(batch))
      .groupBy("constraint")
      .agg(sum("violations").as("violations"), sum("n_rows").as("n_rows"))
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    merged.coalesce(1).write.parquet(tmp.toString)
    StoreCommit.writeMeta(fs, tmp, batchId)
    StoreCommit.swap(fs, dir, tmp)
  }

  /** Scheduler-facing view of the ledger: adds the pass flag, stable order. */
  def ledgerStatus(spark: SparkSession, storeDir: String): DataFrame =
    readLedger(spark, storeDir)
      .select(col("constraint"), col("violations"), col("n_rows"),
        (col("violations") === 0L).as("passed"))
      .orderBy("constraint")
}
