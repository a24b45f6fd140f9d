package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted CDC snapshot — the incremental twin of `q_cdc_upsert`.
  *
  * The declared row compacts a WHOLE changelog and applies it to a base
  * snapshot in one shot; a lake mirroring a mutable source table instead
  * receives the changelog in micro-batches and must fold each one into the
  * stored snapshot WITHOUT replaying history. The store persists:
  *
  *   snapshot/  (key, payload..., _seq, _deleted) — one row per key ever
  *              seen, tombstones kept (`_deleted` = true)
  *   _graft_committed_batch — the replay cursor ([[StoreCommit]] meta),
  *              swapped atomically WITH the content
  *
  * `apply` folds one changelog micro-batch: batch-local latest-wins
  * compaction (the same WindowGroupLimit shape as the declared row), then
  * ONE full-outer key join against the stored snapshot where the higher
  * `_seq` wins — so the final state is "max-seq record per key" regardless
  * of how the changelog was cut into batches. That makes the fold
  * SPLIT-INVARIANT (stronger than the packing store's monotonic-feed
  * contract): any batch partition of the changelog, even one that delivers
  * stale sequence numbers after newer ones, converges to the one-shot
  * merge — OperatorsSpec pins both the equality and the stale-update
  * fencing. Deletes persist as TOMBSTONES rather than physical removals,
  * so a late-arriving pre-delete update cannot resurrect a deleted key
  * (the tombstone's `_seq` fences it); [[read]] serves the live table with
  * tombstones filtered. Replay is effectively once via the committed-batch
  * cursor (a replayed batchId returns BEFORE any computation); crash
  * mid-swap restores via the [[StoreCommit]] aside discipline.
  *
  * At 100 TB: the per-batch work is one delta-sized window plus one
  * co-partitioned key join, but the publish rewrites `snapshot/` — the
  * same accepted O(store) union-rewrite shape as [[PackingStore]]; when
  * that term matters the layout generalizes to `bucket=<key-hash>/`
  * subdirs with per-bucket swaps (only buckets containing delta keys are
  * rewritten — the bucketed regularity store in [[Monitoring]] is the
  * worked example), leaving the merge arithmetic and the invariants above
  * unchanged. */
object SnapshotStore {

  val SeqCol = "_seq"
  val TombstoneCol = "_deleted"

  /** The live mirrored table: tombstones filtered, bookkeeping dropped. */
  def read(spark: SparkSession, storeDir: String): DataFrame =
    readAll(spark, storeDir)
      .filter(!col(TombstoneCol))
      .drop(SeqCol, TombstoneCol)

  /** Every row ever seen, including tombstones — the audit/GDPR view and
    * the spec's fencing probe. */
  def readAll(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = new Path(storeDir)
    val root = StoreCommit.readableRoot(StoreCommit.fsOf(spark, dir), dir)
    spark.read.parquet(new Path(root, "snapshot").toString)
  }

  /** Initialize from a base snapshot (the bulk-load before the changelog
    * stream attaches). Base rows carry `_seq` = 0, so any change with a
    * positive sequence number supersedes them. The commit cursor is
    * stamped −1 — the bulk load is not a micro-batch, so the stream's own
    * batch 0 must still fold (a build-then-stream pipeline would silently
    * drop its first micro-batch otherwise). `base` must not already
    * contain the bookkeeping columns. */
  def build(spark: SparkSession, base: DataFrame, storeDir: String): Unit =
    publish(spark, storeDir, batchId = -1L,
      snapshot = base
        .withColumn(SeqCol, lit(0L))
        .withColumn(TombstoneCol, lit(false)))

  /** Fold one changelog micro-batch; replayed batchIds are a no-op. A
    * first apply on a not-yet-built store initializes from the batch
    * itself (batch 0 IS the build — the streaming path starts empty).
    *
    * `changes` columns: `keyCol`, `seqCol` (total order per key across
    * the WHOLE changelog), `opCol` (= `deleteOp` for deletes), payload.
    *
    * Precondition for FULL split invariance: `seqCol` is unique per key.
    * Duplicated (key, seq) rows inside one batch now resolve
    * deterministically (op, then payload-hash tie-break below), but a
    * duplicate pair SPLIT ACROSS batches still resolves stored-row-wins
    * (the strict `>` in the fold) — which may differ from the tie-break
    * winner had both rows shared a batch. Under a seq-unique changelog
    * (every real CDC source: LSN/SCN/binlog offset) the distinction is
    * vacuous. */
  def apply(
      spark: SparkSession, changes: DataFrame, storeDir: String,
      batchId: Long, keyCol: String, seqCol: String = "seq",
      opCol: String = "op", deleteOp: String = "D"): Unit = {
    val dir = new Path(storeDir)
    val fs = StoreCommit.fsOf(spark, dir)
    if (StoreCommit.committedBatch(fs, dir) >= batchId) return // replay: done
    val payloadCols = changes.columns.toSeq
      .filterNot(c => c == keyCol || c == seqCol || c == opCol)
    // batch-local latest-wins compaction — rn=1 plans as a WindowGroupLimit.
    // seq desc alone leaves the winner NONDETERMINISTIC when two change
    // rows inside one batch share (key, seq) — the split-invariance proof
    // assumes per-key seq uniqueness but nothing upstream enforces it
    // (r12 ADVICE). Deterministic tie-break: op first (a delete outranks
    // an upsert at the same seq — the conservative read for a contract
    // violation), then a payload hash, so any two runs over any batch
    // split of the same duplicated changelog pick the SAME row. The
    // delete-wins term compares against `deleteOp` DIRECTLY rather than
    // sorting op strings lexically — "D" < "I"/"U" made the plain asc sort
    // look right, but deleteOp is caller-supplied, and an op vocabulary
    // like ("append", deleteOp = "delete") would have silently inverted
    // the documented conservative rule while staying deterministic
    // (r13 ADVICE).
    val tieBreak = xxhash64((col(opCol) +: payloadCols.map(col)): _*)
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCol)
          .orderBy(col(seqCol).desc, (col(opCol) === deleteOp).desc,
            col(opCol).asc, tieBreak.asc)))
      .filter(col("_rn") === 1)
      .select(
        col(keyCol) +:
          col(seqCol).cast("long").as(SeqCol) +:
          (col(opCol) === deleteOp).as(TombstoneCol) +:
          payloadCols.map(col): _*)
    val hasStore = fs.exists(
      new Path(StoreCommit.readableRoot(fs, dir), "snapshot"))
    if (!hasStore) { publish(spark, storeDir, batchId, latest); return }
    val snap = readAll(spark, storeDir)
    // ONE co-partitioned full-outer key join; the higher _seq wins, so a
    // batch carrying only stale sequence numbers folds to a no-op
    val win = col(s"c.$SeqCol").isNotNull &&
      (col(s"s.$SeqCol").isNull || col(s"c.$SeqCol") > col(s"s.$SeqCol"))
    val next = snap.as("s").join(latest.as("c"), Seq(keyCol), "full_outer")
      .select(
        col(keyCol) +:
          when(win, col(s"c.$SeqCol")).otherwise(col(s"s.$SeqCol")).as(SeqCol) +:
          when(win, col(s"c.$TombstoneCol")).otherwise(col(s"s.$TombstoneCol"))
            .as(TombstoneCol) +:
          payloadCols.map(p =>
            when(win, col(s"c.$p")).otherwise(col(s"s.$p")).as(p)): _*)
    publish(spark, storeDir, batchId, next)
  }

  private def publish(
      spark: SparkSession, storeDir: String, batchId: Long,
      snapshot: DataFrame): Unit = {
    val dir = new Path(storeDir)
    val fs = StoreCommit.fsOf(spark, dir)
    StoreCommit.recover(fs, dir)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    snapshot.write.mode(SaveMode.Overwrite).parquet(s"$tmp/snapshot")
    StoreCommit.writeMeta(fs, tmp, batchId)
    StoreCommit.swap(fs, dir, tmp)
  }
}
