package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental sequence packing — the persisted twin of `q_text_packing`.
  *
  * The batch query packs a WHOLE corpus by one windowed prefix-sum per
  * language shard; a training pipeline, however, receives documents in
  * append-only batches and must extend the pack layout WITHOUT recomputing
  * (or even rescanning) what is already packed. The only state the
  * concat-and-cut packer needs is one number per shard — the cumulative
  * token total — so this store persists:
  *
  *   assignments/bucket=k/  (doc_id, lang, n_tokens, pack_id, pack_offset,
  *                  n_packs_spanned) — immutable once written, hash-
  *                  bucketed on doc_id ([[BucketedRuns]] layout: per-batch
  *                  `delta-b*.parquet` files + compacted `base-*` runs)
  *   cursors/      (lang, cum) — the running token total per shard, PLUS
  *                  the replay cursor ([[StoreCommit]] meta): the cursors
  *                  swap is the COMMIT POINT, so content and cursor can
  *                  never diverge
  *
  * `append(batchId)` folds one micro-batch: a batch-local prefix-sum per
  * shard (the same single-shuffle window as the batch query) is offset by
  * the stored cursor base, so each document's global pack arithmetic is
  * identical to what the one-shot packer would compute — OperatorsSpec
  * pins incremental == one-shot bit-for-bit for doc_id-monotonic batches
  * (the append-only log order; out-of-order arrivals still pack
  * deterministically by arrival, they just differ from a from-scratch
  * repack, exactly as a real packed corpus would). Replay is effectively
  * once via the committed-batch cursor: a replayed batchId is a no-op
  * BEFORE any computation. A crash between the delta-file adds and the
  * cursors swap replays to the IDENTICAL delta (the cursor still holds the
  * old base, the window is deterministic) and the existing delta files are
  * skipped by name — the torn publish heals to exactly one application.
  *
  * At 100 TB (r14 verdict task 1 — the O(store) union-rewrite retired):
  * the cursor table is shard-count-sized (bytes), the per-batch window is
  * delta-sized, and the publish now ADDS one immutable file per touched
  * bucket instead of rewriting `assignments/` whole — per-batch I/O is
  * O(delta), with the bounded-file-count guarantee paid by per-bucket
  * threshold compaction (amortized O(store/CompactAt), one bucket at a
  * time — see [[BucketedRuns]]). This is exactly the bucketed-shard layout
  * the r12–r14 scaladocs promised from [[Monitoring]]'s regularity store,
  * now implemented rather than documented.
  *
  * Feed-contract invariant (r13 ADVICE, narrowed with the O(delta)
  * publish): the feed is append-only and batch-deduplicated — a doc_id
  * never re-arrives under a NEW batchId. The duplicate-doc_id check runs
  * where it is still FREE: within each delta before publish (O(delta)),
  * and across the whole corpus in build() (which is O(corpus) anyway).
  * The cross-batch case is no longer checked per append — re-checking
  * every incoming id against the store is precisely the O(store) read the
  * r12 ADVICE retired; the committed-batch cursor already blocks the
  * replay shape, leaving only a truly misbehaving upstream, which build()
  * surfaces on the next repack. */
object PackingStore {

  val DefaultBudget = 256L

  /** Bucket count / compaction threshold for the assignments layout —
    * sandbox-sized like [[SignatureStore.Buckets]]; deployment dials. */
  val Buckets = 8
  val CompactAt = 16

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

  /** Pack a token table given per-shard base offsets (lang, base). */
  private def packWithBase(tok: DataFrame, base: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tok
      .withColumn("cum_local", sum("n_tokens").over(w))
      .join(base, Seq("lang"), "left")
      .withColumn("cum", col("cum_local") + coalesce(col("base"), lit(0L)))
      .select(
        col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("pack_id"),
        expr(s"(cum - n_tokens) % $budget").as("pack_offset"),
        (expr(s"(cum - 1) div $budget") - expr(s"(cum - n_tokens) div $budget") + 1)
          .as("n_packs_spanned"))
  }

  private def assignRoot(root: Path) = new Path(root, "assignments")
  private def cursorDir(root: Path) = new Path(root, "cursors")

  /** The live pack-assignment table — one multi-path read over the
    * committed bucket dirs (two-level swap-safe resolution: whole-root
    * crash aside first, then per-bucket asides). */
  def read(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = new Path(storeDir)
    val fs = StoreCommit.fsOf(spark, dir)
    val root = StoreCommit.readableRoot(fs, dir)
    // COMMITTED-ONLY selection: delta files land in live bucket dirs before
    // the cursors swap (the commit point), so a directory-level read could
    // return batch N's assignments while cursors() still says N-1 — the
    // content/cursor coherence the scaladoc promises readers (r15 review
    // finding). Gate delta files by the committed cursor; base/build files
    // are committed by construction.
    val committed = StoreCommit.committedBatchReadable(
      fs, StoreCommit.readableRoot(fs, cursorDir(root)))
    val files = BucketedRuns.committedFiles(fs, assignRoot(root), Buckets, committed)
    if (files.isEmpty)
      // preserve the historical contract: reading a never-built store throws
      spark.read.parquet(assignRoot(dir).toString)
    else spark.read.parquet(files.map(_.toString): _*)
  }

  /** The per-shard running token totals. */
  def cursors(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = new Path(storeDir)
    val fs = StoreCommit.fsOf(spark, dir)
    val root = StoreCommit.readableRoot(fs, dir)
    val c = StoreCommit.readableRoot(fs, cursorDir(root))
    spark.read.parquet(c.toString).select("lang", "cum")
  }

  /** One-shot build from a full corpus (batch 0 of the incremental life).
    * Whole-root atomic swap (a rebuild is all-or-nothing); the full-corpus
    * duplicate-doc_id invariant check lives here, where it is free. */
  def build(
      spark: SparkSession, docs: DataFrame, storeDir: String,
      budget: Long = DefaultBudget): Unit =
    publishFull(spark, storeDir, batchId = 0L,
      assignments = packWithBase(
        tokens(docs),
        spark.range(0).select(lit("").as("lang"), lit(0L).as("base")), budget))

  /** Fold one append-only micro-batch; replayed batchIds are a no-op.
    * A first append on a not-yet-built store initializes it (the
    * streaming path starts from nothing — batch 0 IS the build). */
  def append(
      spark: SparkSession, docs: DataFrame, storeDir: String, batchId: Long,
      budget: Long = DefaultBudget): Unit = {
    val dir = new Path(storeDir)
    val fs = StoreCommit.fsOf(spark, dir)
    StoreCommit.recover(fs, dir) // writer-side whole-root crash restore
    val committed = StoreCommit.committedBatch(fs, cursorDir(dir))
    if (committed >= batchId) return // replay: done
    if (BucketedRuns.isFlat(fs, assignRoot(dir)))
      throw new IllegalStateException(
        s"${assignRoot(dir)} holds a pre-bucketed (flat) packing store; " +
          "migrate by rebuilding (build over read) before resuming")
    // drop uncommitted orphan delta files (a publish torn before its
    // cursors swap) so this publish can never hit the skip-if-exists
    // branch against a dead sibling's file (r15 review finding)
    BucketedRuns.scrubUncommitted(fs, assignRoot(dir), Buckets, committed)
    val emptyBase = spark.range(0).select(lit("").as("lang"), lit(0L).as("base"))
    val hasStore = fs.exists(cursorDir(dir))
    if (!hasStore) {
      publishFull(spark, storeDir, batchId,
        assignments = packWithBase(tokens(docs), emptyBase, budget))
      return
    }
    val base = cursors(spark, storeDir).select(col("lang"), col("cum").as("base"))
    val delta = packWithBase(tokens(docs), base, budget).cache()
    try {
      // the within-delta half of the feed invariant — O(delta), free
      val dup = delta.groupBy("doc_id").count().filter(col("count") > 1L).limit(1)
        .collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          s"PackingStore.append: doc_id ${dup.head.get(0)} appears " +
            s"${dup.head.getLong(1)} times in batch $batchId — the feed " +
            "violated the batch-deduplicated contract; refusing to publish")
      // O(delta) publish: per-bucket immutable delta files, idempotent names
      val touched = BucketedRuns.publishDelta(spark, fs, dir, assignRoot(dir),
        BucketedRuns.withBucket(delta, "doc_id", Buckets), batchId, Buckets)
      // COMMIT POINT: new cursors (stored base + delta totals — O(shards))
      // swap in WITH the batch meta; content and cursor move as one
      val newCursors = base.join(
          delta.groupBy("lang").agg(sum("n_tokens").as("d")), Seq("lang"), "full_outer")
        .select(col("lang"),
          (coalesce(col("base"), lit(0L)) + coalesce(col("d"), lit(0L))).as("cum"))
      publishCursors(spark, fs, dir, batchId, newCursors)
      // maintenance AFTER the commit: bounded file counts per bucket
      touched.foreach(k =>
        BucketedRuns.compactIfNeeded(spark, fs, dir, assignRoot(dir), k, CompactAt))
    } finally delta.unpersist()
  }

  /** Swap in a new cursors/ dir carrying the batch meta (the commit). */
  private def publishCursors(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      batchId: Long, cursors: DataFrame): Unit = {
    val tmp = new Path(dir.getParent, s".${dir.getName}.cursors")
    fs.delete(tmp, true)
    cursors.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    StoreCommit.writeMeta(fs, tmp, batchId)
    StoreCommit.swap(fs, cursorDir(dir), tmp)
  }

  /** Whole-root publish (build / first-append init): bucketed assignments,
    * derived cursors, batch meta — one atomic swap. */
  private def publishFull(
      spark: SparkSession, storeDir: String, batchId: Long,
      assignments: DataFrame): Unit = {
    val dir = new Path(storeDir)
    val fs = StoreCommit.fsOf(spark, dir)
    StoreCommit.recover(fs, dir)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    val a = assignments.cache()
    try {
      // full-corpus feed invariant (r13 ADVICE): a doc_id must appear
      // exactly once — checked here where the frame is in hand anyway
      val dup = a.groupBy("doc_id").count().filter(col("count") > 1L).limit(1)
        .collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          s"PackingStore: doc_id ${dup.head.get(0)} appears " +
            s"${dup.head.getLong(1)} times in the assignment table — " +
            "the feed violated the append-only contract; refusing to publish")
      BucketedRuns.withBucket(a, "doc_id", Buckets)
        .repartition(col(BucketedRuns.BucketCol))
        .write.partitionBy(BucketedRuns.BucketCol).parquet(s"$tmp/assignments")
      // cursor = total tokens per shard; derived from the SAME frame that
      // was just published, so content and cursor cannot diverge
      a.groupBy("lang").agg(sum("n_tokens").as("cum"))
        .write.mode(SaveMode.Overwrite).parquet(s"$tmp/cursors")
      StoreCommit.writeMeta(fs, new Path(s"$tmp/cursors"), batchId)
      StoreCommit.swap(fs, dir, tmp)
    } finally a.unpersist()
  }
}
