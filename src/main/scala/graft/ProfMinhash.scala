package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q_dedup_minhash pipeline (dev only) — stage
  * timings for docs/banded/verify/closure on a given sf dir. */
object ProfMinhash {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  private def bandHashes(sig: Column, rows: Int, bands: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws("|", slice(sig, b * lit(rows) + 1, lit(rows))), b))

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (pass <- 1 to 2) {
      println(s"=== pass $pass ===")
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
        .cache()
      time("docs count")(docs.count())

      // sig+bands only (no bitmaps yet)
      val sigs = docs.select(col("doc_id"),
        bandHashes(graft.functions.VectorFunctions.minhashSig(col("ws"), 32), 8, 4).as("bhs"))
      time("sigs+bands")(sigs.write.format("noop").mode("overwrite").save())

      // full banded-bitmap frame via the production path: replicate packBitmaps
      val VocabBuckets = 256
      val vocab = docs.select(explode(col("ws")).as("w")).distinct()
        .withColumn("bucket", pmod(xxhash64(col("w")), lit(VocabBuckets)).cast("int"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("bucket").orderBy("w")).cast("long"))
      val bucketSizes = vocab.groupBy("bucket").agg(count(lit(1)).as("bsz"))
      val W = org.apache.spark.sql.expressions.Window
      val offsets = bucketSizes
        .withColumn("off",
          coalesce(sum("bsz").over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .withColumn("nwords",
          ((sum("bsz").over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)) + 63) / 64).cast("int"))
      val numbered = vocab.join(broadcast(offsets.select("bucket", "off", "nwords")), "bucket")
        .select(col("w"), (col("off") + col("rn") - 1).cast("int").as("bit"), col("nwords"))
      val bitmaps = docs
        .select(col("doc_id"), explode(col("ws")).as("w"))
        .join(broadcast(numbered), "w")
        .groupBy("doc_id")
        .agg(collect_list(col("bit")).as("bits"), first(col("nwords")).as("nwords"))
        .select(col("doc_id"),
          graft.functions.VectorFunctions.packBits(col("bits"), col("nwords")).as("bitmap"))
      val banded = sigs
        .join(bitmaps, "doc_id")
        .select(col("doc_id"), col("bitmap"), posexplode(col("bhs")))
        .toDF("doc_id", "bitmap", "band", "bh")
        .cache()
      time("banded (pack+join) count")(banded.count())

      val jac = graft.functions.VectorFunctions.bitmapJaccard(col("x.bitmap"), col("y.bitmap"))
      val rawCand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      println(s"[prof] raw candidates = ${time("raw cand")(rawCand.count())}")
      val verified = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id") && jac >= lit(0.9))
        .select(col("x.doc_id").as("src"), col("y.doc_id").as("dst"))
        .distinct()
      val sym = verified.union(verified.select(col("dst").as("src"), col("src").as("dst"))).cache()
      println(s"[prof] sym edges = ${time("verify+sym")(sym.count())}")

      val labels = time("closure construct")(
        graft.operators.Closure.minLabel(docs.select(col("doc_id").as("id")), sym, rounds = 6))
      time("closure exec")(labels.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
