package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The persisted-store commit discipline shared by every incremental store
  * (monitor ledgers, sketches, hourly tables): build the new version in a
  * dot-prefixed `.building` sibling (invisible to partition discovery),
  * write the committed micro-batch id INSIDE it (so store content and
  * replay cursor move as one), then publish via two renames through a
  * `.previous` aside.
  *
  * Plain renames cannot atomically exchange two directories, so there is an
  * unavoidable instant between "dir moved aside" and "tmp renamed in" where
  * the store path is ABSENT. [[recover]] closes that window: every reader
  * and every replay-guard check first restores the aside if the main dir is
  * missing — the same crash discipline [[Compaction]]/[[Zorder]] use for
  * their rewrite swaps. Before this was factored out, six near-identical
  * copies of the swap existed and NONE of the monitor stores recovered the
  * aside, so a crash inside the window silently reset the store to empty
  * and the next fold re-counted from zero.
  */
object StoreCommit {

  /** '_' prefix: invisible to Spark's parquet FileIndex, so the replay
    * cursor can live inside the data directory and swap with it. */
  val MetaFile = "_graft_committed_batch"

  def fsOf(spark: SparkSession, dir: Path): FileSystem =
    FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)

  private def asideOf(dir: Path) = new Path(dir.getParent, s".${dir.getName}.previous")

  /** Crash restore: if the store dir is absent but the swap aside exists,
    * the process died inside the rename window — put the last committed
    * version back. MUTATES the store, so it belongs to the single-writer
    * update path ONLY (each store has one serialized writer — the
    * foreachBatch loop or the maintenance job). A concurrent READER must
    * never call this: mid-swap it would rename the aside back between the
    * writer's two renames and corrupt the publish — use [[readableRoot]]
    * instead. Tolerates racing itself: if the rename fails because the
    * dir reappeared (the writer finished), that is success. */
  def recover(fs: FileSystem, dir: Path): Unit = {
    val aside = asideOf(dir)
    if (!fs.exists(dir) && fs.exists(aside) &&
        !fs.rename(aside, dir) && !fs.exists(dir))
      throw new java.io.IOException(s"store: cannot restore $dir from crash aside $aside")
  }

  /** Non-mutating read-side resolution: the path a READER should load —
    * the store dir if present, else the crash aside (the last committed
    * version, readable in place), else the store dir (caller sees
    * not-yet-built). Safe under a concurrent writer's swap because it
    * renames nothing; the writer's own recover()/swap() puts the main dir
    * back on its next cycle. */
  def readableRoot(fs: FileSystem, dir: Path): Path = {
    if (fs.exists(dir)) dir
    else {
      val aside = asideOf(dir)
      if (fs.exists(aside)) aside else dir
    }
  }

  /** The committed batch id inside the store (−1 before the first commit).
    * Runs [[recover]] first so a crash-replayed batch always sees the last
    * committed cursor, never a reset store. */
  def committedBatch(fs: FileSystem, dir: Path): Long = {
    recover(fs, dir)
    val p = new Path(dir, MetaFile)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .trim.toLong
      finally in.close()
    }
  }

  /** READ-SIDE committed batch id: resolves through [[readableRoot]]
    * instead of [[recover]], so a concurrent monitor/reader can poll the
    * cursor without ever renaming anything (recover() from a reader can
    * rename the aside back INSIDE the writer's swap window and corrupt the
    * publish — its own scaladoc forbids it; r15 review finding). */
  def committedBatchReadable(fs: FileSystem, dir: Path): Long = {
    val d = readableRoot(fs, dir)
    val p = new Path(d, MetaFile)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .trim.toLong
      finally in.close()
    }
  }

  /** Stamp the batch id into a not-yet-published build dir. */
  def writeMeta(fs: FileSystem, dir: Path, batchId: Long): Unit = {
    val out = fs.create(new Path(dir, MetaFile), true)
    try out.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Publish `tmp` as `dir` via the two-rename aside swap. A reader sees
    * the old store or the new one — or, if the process dies mid-window,
    * [[recover]] restores the old one on the next touch. */
  def swap(fs: FileSystem, dir: Path, tmp: Path): Unit = {
    val aside = asideOf(dir)
    fs.delete(aside, true)
    if (fs.exists(dir) && !fs.rename(dir, aside))
      throw new java.io.IOException(s"store swap: cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.exists(aside) && fs.rename(aside, dir)
      throw new java.io.IOException(s"store swap: publish failed for $dir, " +
        (if (rolledBack) "rolled back" else s"no rollback (see $aside)"))
    }
    fs.delete(aside, true)
  }
}
