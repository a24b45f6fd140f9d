package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Partition compaction — the lake-maintenance operator the streaming ingest
  * path makes necessary: a 60 s trigger (Firehose parity) writes at least one
  * file per partition per micro-batch, so an hour partition accretes ~60
  * small files and a day ~1440 x sources. Small files poison a 100 TB lake
  * twice over: scan tasks degenerate to per-file overhead, and file listing
  * dominates planning. The reference never solves this (its gzip NDJSON
  * output has the same shape; Athena just eats the cost per query).
  *
  * `compactPartition` rewrites one closed partition directory to
  * ceil(bytes / targetBytes) files — compact ONLY partitions the streaming
  * trigger has moved past (e.g. previous hours), never the one being written.
  * The rewrite goes to a sibling temp dir then swaps via two renames, so a
  * concurrent reader sees either the old layout or the new one, never a
  * partial mix (rename is atomic per path on HDFS-like filesystems; on S3 a
  * real deployment would swap via the table format's metadata instead).
  */
object Compaction {

  /** Compact one partition directory (e.g. `$events/year=2026/month=08/...`).
    * Returns (filesBefore, filesAfter); no-op when already compact. */
  def compactPartition(
      spark: SparkSession,
      partitionDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(partitionDir)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    // crash recovery: a failure between the two swap renames leaves the data
    // only in the hidden .precompact sibling (invisible to partition
    // discovery) and the partition path absent — restore it before anything
    // else, or every later call would die in listStatus below
    val crashLeftover = new Path(path.getParent, s".${path.getName}.precompact")
    if (!fs.exists(path) && fs.exists(crashLeftover)) {
      if (!fs.rename(crashLeftover, path))
        throw new java.io.IOException(
          s"compaction: cannot restore $path from crash leftover $crashLeftover")
    }
    val files = fs.listStatus(path).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (files.length <= targetFiles) return (files.length, files.length)

    // scratch dirs are DOT-prefixed siblings: partition discovery ignores
    // `.`/`_`-led names, so readers of the table root never see the rewrite
    // in progress or its crash leftovers (a bare `hour=05_precompact` sibling
    // would parse as a real partition with a corrupt value)
    val tmp = new Path(path.getParent, s".${path.getName}.compacting")
    val old = new Path(path.getParent, s".${path.getName}.precompact")
    fs.delete(tmp, true) // stale leftovers from a previously crashed run
    fs.delete(old, true)
    spark.read.parquet(partitionDir)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    // two-rename swap: readers see old or new, never both. Every rename is
    // checked — deleting `old` on a failed swap would destroy the partition.
    if (!fs.rename(path, old)) {
      fs.delete(tmp, true)
      throw new java.io.IOException(s"compaction: cannot move $path aside")
    }
    if (!fs.rename(tmp, path)) {
      val rolledBack = fs.rename(old, path)
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"compaction: swap failed for $path, " +
          (if (rolledBack) "rolled back to the original layout"
           else s"ROLLBACK ALSO FAILED - original data preserved at $old"))
    }
    fs.delete(old, true)
    val after = fs.listStatus(path).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    (files.length, after)
  }

  /** Compact every partition of an events table EXCEPT the currently-open
    * one(s), identified by modification time newer than `settledMs` ago —
    * the cron-job form (the reference's 10-minute partition cron slot). */
  def compactSettledPartitions(
      spark: SparkSession,
      eventsDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      settledMs: Long = 2 * 60 * 1000): Seq[(String, Int, Int)] = {
    val root = new Path(eventsDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - settledMs

    def leafPartitions(p: Path): Seq[Path] = {
      val children = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
      if (children.isEmpty) Seq(p)
      else children.toSeq.flatMap(leafPartitions)
    }

    leafPartitions(root).filter(_ != root).flatMap { part =>
      val newest = fs.listStatus(part).filter(_.isFile).map(_.getModificationTime)
      if (newest.nonEmpty && newest.max < cutoff) {
        val (before, after) = compactPartition(spark, part.toString, targetBytes)
        if (before != after) Some((part.toString, before, after)) else None
      } else None
    }
  }
}
