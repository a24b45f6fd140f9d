package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One lifecycle for every persisted dedup-signature artifact — the stored
  * MinHash band table (`q_dedup_incremental`), the substring window-hash
  * table (`q_dedup_substrings_incremental`), and the embedding LSH band
  * table (`q_dedup_embed_incremental`) each previously hand-rolled their
  * publish/append; this gives them the [[VectorIndex]] discipline in one
  * operator, generic over the signature schema (any frame with a long id
  * column):
  *
  *   sigs/        the signature rows, whatever their shape
  *   tombstones/  erased ids — GDPR for text/embeddings: erasing a
  *                document removes its signatures AND pins the id so no
  *                append or rebuild replay can ever re-sign it; future
  *                crawls can no longer match the erased content through
  *                this store
  *
  * Publishing is the aside + rename + rollback swap (readers see the old
  * store or the new one, never a mix); append is replay-idempotent
  * (anti-join on existing ids) and tombstone-respecting; delete persists
  * the request even when no signature rows match yet (the corpus row may
  * exist un-signed — the same resurrection window the vector indexes
  * close). Erasure semantics under SHARED signatures: rows are attributed
  * by id, so erasing a document removes ITS rows only — a window hash
  * another document also holds survives through that document's rows,
  * which is correct (the other document legitimately still carries the
  * content).
  *
  * At 100 TB: signature rows are a few dozen bytes per document/window
  * (never the text/vectors themselves at substring scale — the minhash
  * and embed tables carry their verify payloads exactly as the in-query
  * operators define them); the scrub joins read `sigs/` through
  * band/hash equi-joins, and a store bucketed on the join key makes the
  * per-snapshot scrub shuffle-free on the corpus side. */
object SignatureStore {

  private def fsOf(spark: SparkSession, dir: Path): FileSystem =
    FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)

  private def atomicSwap(fs: FileSystem, dir: Path, tmp: Path): Unit =
    StoreCommit.swap(fs, dir, tmp) // shared two-rename discipline + recoverable aside

  private def tombstonesOf(
      spark: SparkSession, storeDir: String, idCol: String): DataFrame = {
    // non-mutating read resolution — the swap unit is the whole store root
    val root = StoreCommit.readableRoot(
      fsOf(spark, new Path(storeDir)), new Path(storeDir))
    val t = new Path(root, "tombstones")
    if (fsOf(spark, t).exists(t)) spark.read.parquet(t.toString)
    else spark.range(0).select(col("id").as(idCol))
  }

  /** The live signature table (for scrub/incremental-dedup joins). */
  def read(spark: SparkSession, storeDir: String): DataFrame = {
    // non-mutating read resolution — the swap unit is the whole store root
    val root = StoreCommit.readableRoot(
      fsOf(spark, new Path(storeDir)), new Path(storeDir))
    spark.read.parquet(new Path(root, "sigs").toString)
  }

  /** Build (or rebuild) and atomically publish. A rebuild RESPECTS existing
    * tombstones — re-signing the corpus must not resurrect an erased id. */
  def build(
      spark: SparkSession, sigs: DataFrame, storeDir: String,
      idCol: String = "doc_id"): Unit = {
    val dir = new Path(storeDir)
    val fs = fsOf(spark, dir)
    StoreCommit.recover(fs, dir) // writer-side crash restore
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    val tombstones = tombstonesOf(spark, storeDir, idCol)
    sigs.join(broadcast(tombstones.select(idCol)), Seq(idCol), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/sigs")
    tombstones.select(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/tombstones")
    atomicSwap(fs, dir, tmp)
  }

  /** Append a delta of signatures — replay-idempotent (ids already stored
    * anti-join away) and tombstone-respecting (erased ids cannot re-enter,
    * whatever the replay order). */
  def append(
      spark: SparkSession, sigs: DataFrame, storeDir: String,
      idCol: String = "doc_id"): Unit = {
    val dir = new Path(storeDir)
    val fs = fsOf(spark, dir)
    StoreCommit.recover(fs, dir) // writer-side crash restore
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    val existing = read(spark, storeDir)
    val tombstones = tombstonesOf(spark, storeDir, idCol)
    val fresh = sigs
      .join(existing.select(idCol).distinct(), Seq(idCol), "left_anti")
      .join(broadcast(tombstones.select(idCol)), Seq(idCol), "left_anti")
    existing.unionByName(fresh)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/sigs")
    tombstones.select(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/tombstones")
    atomicSwap(fs, dir, tmp)
  }

  /** GDPR erase: drop the ids' signature rows and persist the ids as
    * tombstones — ALWAYS, including when no signature row matches yet
    * (signing may lag ingest; the erase must stick either way). Returns
    * the number of signature rows removed. */
  def delete(
      spark: SparkSession, storeDir: String, ids: Seq[Long],
      idCol: String = "doc_id"): Long = {
    import spark.implicits._
    val dir = new Path(storeDir)
    val fs = fsOf(spark, dir)
    StoreCommit.recover(fs, dir) // writer-side crash restore
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)
    val requested = ids.toDF(idCol)
    val existing = read(spark, storeDir)
    val nDead = existing.join(broadcast(requested), Seq(idCol), "left_semi").count()
    existing.join(broadcast(requested), Seq(idCol), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/sigs")
    tombstonesOf(spark, storeDir, idCol).select(idCol)
      .unionByName(requested).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/tombstones")
    atomicSwap(fs, dir, tmp)
    nDead
  }
}
