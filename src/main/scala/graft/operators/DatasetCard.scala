package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained dataset card — `q_train_dataset_card` in
  * O(delta) per crawl snapshot. Recomputing a datasheet means re-scanning
  * the corpus (one Expand + agg — cheap once, not every hour at 100 TB);
  * this operator keeps the card DERIVABLE from state that updates with
  * each snapshot:
  *
  *   partials/   per-(source, lang) additive tallies: n_docs, n_tokens,
  *               n_chars, n_dups — a few rows per language pair
  *   firstseen/  (text_hash, first doc_id) for exact-dup attribution —
  *               8+8 bytes per DISTINCT text, the same xxhash64 stance as
  *               the exact-dedup family (hash-groupBy; text never
  *               shuffles, never persists)
  *   meta/       one row: the max processed doc_id — the monotonic
  *               boundary (the ReplayGuard premise: crawl ids increase)
  *
  * `update` folds a delta in: rows at or below the boundary are dropped
  * (an at-least-once replay is a no-op — same discipline as the index
  * appends), a delta row is a dup if its text was first seen EARLIER
  * (stored firstseen, or a smaller id inside the delta — exactly the
  * keep-first rule the full query's window computes), partials merge by
  * addition, and the whole state republishes through the atomic swap.
  * `card` then emits the full grouping-sets card — (source, lang) /
  * (source) / () with grouping()-labeled rollups, integer basis points —
  * from the partials alone, bit-identical to recomputing the query from
  * scratch on everything processed so far (OperatorsSpec pins it). */
object DatasetCard {

  private def fsOf(spark: SparkSession, dir: Path): FileSystem =
    FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)

  private def atomicSwap(fs: FileSystem, dir: Path, tmp: Path): Unit =
    StoreCommit.swap(fs, dir, tmp) // shared two-rename discipline + recoverable aside

  /** Resolve the card root a READER should use — non-mutating (a reader
    * must never rename mid-swap; the writer's own recover restores the
    * main dir), falling back to the crash aside when the root is absent. */
  private def readRoot(spark: SparkSession, cardDir: String): Path = {
    val dir = new Path(cardDir)
    StoreCommit.readableRoot(fsOf(spark, dir), dir)
  }

  private def exists(spark: SparkSession, root: Path, child: String): Boolean = {
    val path = new Path(root, child)
    fsOf(spark, path).exists(path)
  }

  /** The processed-id boundary; Long.MinValue before the first update. */
  def boundary(spark: SparkSession, cardDir: String): Long = {
    val root = readRoot(spark, cardDir)
    if (!exists(spark, root, "meta")) Long.MinValue
    else spark.read.parquet(new Path(root, "meta").toString).head().getLong(0)
  }

  /** Fold a delta of documents (doc_id, source, lang, text, n_chars) into
    * the card state. Replay-safe: rows at or below the stored boundary are
    * dropped, so an at-least-once redelivery is a no-op. */
  def update(spark: SparkSession, delta: DataFrame, cardDir: String): Unit = {
    import spark.implicits._
    val dir = new Path(cardDir)
    val fs = fsOf(spark, dir)
    StoreCommit.recover(fs, dir) // crash-windowed swap: restore before touching
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)

    val bound = boundary(spark, cardDir)
    val fresh = delta.filter(col("doc_id") > bound)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        xxhash64(col("text")).as("th"))
      .cache()
    // the writer recovered the main dir above, so these read it directly
    val storedSeen =
      if (exists(spark, dir, "firstseen")) spark.read.parquet(s"$cardDir/firstseen")
      else spark.range(0).select(col("id").as("th"), col("id").as("first_id"))
    val storedPartials =
      if (exists(spark, dir, "partials")) spark.read.parquet(s"$cardDir/partials")
      else Seq.empty[(String, String, Long, Long, Long, Long)]
        .toDF("source", "lang", "n_docs", "n_tokens", "n_chars", "n_dups")

    // keep-first dup rule, incrementally: first seen in the STORE (ids are
    // monotonic, so any stored sighting is earlier), else earlier in the delta
    val marked = fresh
      .withColumn("delta_first", min("doc_id").over(Window.partitionBy("th")))
      .join(storedSeen.select(col("th"), col("first_id")), Seq("th"), "left")
      .withColumn("is_dup",
        col("first_id").isNotNull || col("delta_first") < col("doc_id"))
    val deltaPartials = marked.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))
    val mergedPartials = storedPartials.unionByName(deltaPartials)
      .groupBy("source", "lang")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"), sum("n_dups").as("n_dups"))
    val newSeen = marked.filter(col("first_id").isNull)
      .groupBy("th").agg(min("doc_id").as("first_id"))
    val newBound = fresh.agg(max("doc_id")).head().get(0) match {
      case null => bound
      case m => math.max(bound, m.asInstanceOf[Long])
    }

    mergedPartials.write.mode(SaveMode.Overwrite).parquet(s"$tmp/partials")
    storedSeen.unionByName(newSeen)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/firstseen")
    Seq(newBound).toDF("max_doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/meta")
    fresh.unpersist()
    atomicSwap(fs, dir, tmp)
  }

  /** The datasheet, from partials alone — the `q_train_dataset_card`
    * output shape (grouping-sets rollups, grouping()-based labels, gid in
    * the total order, integer basis points), bit-identical to recomputing
    * the full query over everything processed so far. Work is
    * languages x sources rows — free at any corpus size. */
  def card(spark: SparkSession, cardDir: String): DataFrame = {
    val root = readRoot(spark, cardDir) // non-mutating read resolution
    spark.read.parquet(new Path(root, "partials").toString)
      .createOrReplaceTempView("card_partials")
    spark.sql("""WITH tot AS (SELECT sum(n_docs) AS total_docs FROM card_partials)
      SELECT CASE WHEN grouping(source) = 1 THEN 'ALL' ELSE source END AS src,
             CASE WHEN grouping(lang) = 1 THEN 'ALL' ELSE lang END AS lng,
             CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid,
             sum(n_docs) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(n_docs) * 10000 div max(total_docs) AS BIGINT) AS share_bp,
             CAST(sum(n_dups) AS BIGINT) AS n_dups,
             CAST(sum(n_dups) * 10000 div sum(n_docs) AS BIGINT) AS dup_bp
      FROM card_partials, tot
      GROUP BY GROUPING SETS ((source, lang), (source), ())
      ORDER BY src, lng, gid""")
  }
}
