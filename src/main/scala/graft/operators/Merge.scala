package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Copy-on-write partition upsert — the lake-maintenance capability the
  * reference stack cannot express at all: Athena over S3 objects has no
  * UPDATE, so a correction (late-arriving fix, GDPR erasure, enrichment
  * backfill) means hand-rewriting objects. This operator gives the merge
  * the shape a 100 TB lake needs:
  *
  *   - Only partitions the update batch actually TOUCHES are rewritten
  *     (copy-on-write at partition granularity); the rest of the table is
  *     never read, listed, or moved. The touched-partition set is partition
  *     METADATA (distinct partition-key tuples of the update batch) — its
  *     size is bounded by the table's partition count, never by data
  *     volume, so collecting it to the driver is the standard, safe move.
  *   - Within one partition, old rows losing to an update leave via a
  *     LEFT ANTI join on the id (broadcastable: one update batch spread
  *     over its partitions is small per partition) and the update rows
  *     union in — one scan of the touched partition, one write.
  *   - The rewritten partition swaps in with the same two-rename discipline
  *     as [[Compaction]] (tmp `.merging` → aside `.premerge` → swap), so a
  *     concurrent reader sees the old rows or the new rows, never both or
  *     neither; a crash between the renames leaves the data in the hidden
  *     `.premerge` sibling, restored on the next call.
  *
  * Updates must carry the partition columns; rows for partitions that do
  * not exist yet land as fresh partition directories (insert path, single
  * atomic rename). Table formats (Iceberg/Delta/Hudi) move this swap into
  * a metadata commit; on a filesystem lake the rename discipline is the
  * equivalent invariant.
  */
object Merge {

  /** Upsert `updates` into the partitioned parquet table at `tableDir` by
    * `idCol`. Returns one (partitionPath, nReplaced, nInserted) per touched
    * partition. */
  def upsertPartitioned(
      spark: SparkSession,
      tableDir: String,
      updates: DataFrame,
      idCol: String,
      partitionCols: Seq[String]): Seq[(String, Long, Long)] = {
    val root = new Path(tableDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)

    // partition METADATA only: one row per touched partition
    val touched = updates.select(partitionCols.map(col): _*).distinct().collect()

    touched.toSeq.map { pvals =>
      val kvs = partitionCols.zip(pvals.toSeq.map(String.valueOf))
      val part = new Path(tableDir + "/" + kvs.map { case (k, v) => s"$k=$v" }.mkString("/"))
      // cached for the duration of THIS partition's merge (the slice feeds
      // the semi join, anti join, union, and counts), released before the
      // next partition so a wide update batch can't pile up executor blocks
      val u = kvs.foldLeft(updates) { case (df, (k, v)) => df.filter(col(k) === lit(v)) }
        .drop(partitionCols: _*)
        .cache()
      try {
        // crash recovery: a failure between the swap renames left the data
        // only in the hidden .premerge sibling — restore before reading
        val aside = new Path(part.getParent, s".${part.getName}.premerge")
        if (!fs.exists(part) && fs.exists(aside) && !fs.rename(aside, part))
          throw new java.io.IOException(s"merge: cannot restore $part from crash leftover $aside")

        if (!fs.exists(part)) {
          // brand-new partition: stage then one atomic rename into place
          val tmp = new Path(part.getParent, s".${part.getName}.merging")
          fs.delete(tmp, true)
          u.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
          fs.mkdirs(part.getParent)
          if (!fs.rename(tmp, part))
            throw new java.io.IOException(s"merge: cannot place new partition $part")
          (part.toString, 0L, u.count())
        } else {
          val old = spark.read.parquet(part.toString)
          val replaced = old.join(u, Seq(idCol), "left_semi").count()
          val merged = old.join(u, Seq(idCol), "left_anti").unionByName(u, allowMissingColumns = false)
          val tmp = new Path(part.getParent, s".${part.getName}.merging")
          fs.delete(tmp, true)
          fs.delete(aside, true)
          merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
          // two-rename swap, every rename checked (see Compaction)
          if (!fs.rename(part, aside)) {
            fs.delete(tmp, true)
            throw new java.io.IOException(s"merge: cannot move $part aside")
          }
          if (!fs.rename(tmp, part)) {
            val rolledBack = fs.rename(aside, part)
            fs.delete(tmp, true)
            throw new java.io.IOException(
              s"merge: swap failed for $part, " +
                (if (rolledBack) "rolled back to the original layout"
                 else s"ROLLBACK ALSO FAILED - original data preserved at $aside"))
          }
          fs.delete(aside, true)
          (part.toString, replaced, u.count() - replaced)
        }
      } finally u.unpersist()
    }
  }

  /** Targeted row deletion — the right-to-be-forgotten operator (a GDPR
    * erasure cannot wait for [[Retention]]'s age-based expiry). `tombstones`
    * carries the ids to remove plus their partition columns; only touched
    * partitions rewrite (old rows leave via the same LEFT ANTI join the
    * upsert uses, with no union back), behind the same crash-safe
    * two-rename swap. A partition whose every row dies is removed entirely
    * rather than left as an empty directory. Returns (partitionPath,
    * nDeleted) per touched partition; ids absent from the table delete
    * zero rows (idempotent replay). */
  def deletePartitioned(
      spark: SparkSession,
      tableDir: String,
      tombstones: DataFrame,
      idCol: String,
      partitionCols: Seq[String]): Seq[(String, Long)] = {
    val root = new Path(tableDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    val touched = tombstones.select(partitionCols.map(col): _*).distinct().collect()

    touched.toSeq.flatMap { pvals =>
      val kvs = partitionCols.zip(pvals.toSeq.map(String.valueOf))
      val part = new Path(tableDir + "/" + kvs.map { case (k, v) => s"$k=$v" }.mkString("/"))
      val ids = kvs.foldLeft(tombstones) { case (df, (k, v)) => df.filter(col(k) === lit(v)) }
        .select(idCol).distinct().cache()
      try {
        val aside = new Path(part.getParent, s".${part.getName}.premerge")
        if (!fs.exists(part) && fs.exists(aside) && !fs.rename(aside, part))
          throw new java.io.IOException(s"delete: cannot restore $part from crash leftover $aside")
        if (!fs.exists(part)) None
        else {
          val old = spark.read.parquet(part.toString)
          val dying = old.join(ids, Seq(idCol), "left_semi").count()
          if (dying == 0L) None
          else {
            val survivors = old.join(ids, Seq(idCol), "left_anti")
            if (survivors.isEmpty) {
              // whole partition dies: hide then delete, like Retention
              if (!fs.rename(part, aside))
                throw new java.io.IOException(s"delete: cannot move $part aside")
              fs.delete(aside, true)
            } else {
              val tmp = new Path(part.getParent, s".${part.getName}.merging")
              fs.delete(tmp, true)
              fs.delete(aside, true)
              survivors.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
              if (!fs.rename(part, aside)) {
                fs.delete(tmp, true)
                throw new java.io.IOException(s"delete: cannot move $part aside")
              }
              if (!fs.rename(tmp, part)) {
                val rolledBack = fs.rename(aside, part)
                fs.delete(tmp, true)
                throw new java.io.IOException(
                  s"delete: swap failed for $part, " +
                    (if (rolledBack) "rolled back to the original layout"
                     else s"ROLLBACK ALSO FAILED - original data preserved at $aside"))
              }
              fs.delete(aside, true)
            }
            Some((part.toString, dying))
          }
        }
      } finally ids.unpersist()
    }
  }
}
