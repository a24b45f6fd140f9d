package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for the dedup pipelines (dev only). */
object ProfNgram {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  private val VocabBuckets = 256

  private def packBitmaps(sets: DataFrame, setCol: String): DataFrame = {
    val vocab = sets.select(explode(col(setCol)).as("w")).distinct()
      .withColumn("bucket", pmod(xxhash64(col("w")), lit(VocabBuckets)).cast("int"))
      .withColumn("rn", row_number().over(Window.partitionBy("bucket").orderBy("w")).cast("long"))
    val bucketSizes = vocab.groupBy("bucket").agg(count(lit(1)).as("bsz"))
    val offsets = bucketSizes
      .withColumn("off",
        coalesce(sum("bsz").over(Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("nwords",
        ((sum("bsz").over(Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)) + 63) / 64).cast("int"))
    val numbered = vocab.join(broadcast(offsets.select("bucket", "off", "nwords")), "bucket")
      .select(col("w"), (col("off") + col("rn") - 1).cast("int").as("bit"), col("nwords"))
    sets
      .select(col("doc_id"), explode(col(setCol)).as("w"))
      .join(broadcast(numbered), "w")
      .groupBy("doc_id")
      .agg(collect_list(col("bit")).as("bits"), first(col("nwords")).as("nwords"))
      .select(col("doc_id"),
        graft.functions.VectorFunctions.packBits(col("bits"), col("nwords")).as("bitmap"))
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

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        array_distinct(when(size(col("words")) >= 2,
          transform(sequence(lit(0), size(col("words")) - 2),
            i => concat_ws(" ", element_at(col("words"), i + 1), element_at(col("words"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("ws"))
      .filter(size(col("ws")) > 0).cache()
    time("docs")(docs.count())

    val bitmaps = packBitmaps(docs, "ws").cache()
    time("packBitmaps")(bitmaps.count())

    val banded = docs
      .select(col("doc_id"),
        bandHashes(graft.functions.VectorFunctions.minhashSig(col("ws"), 30), 3, 10).as("bhs"))
      .join(bitmaps, "doc_id")
      .select(col("doc_id"), col("bitmap"), posexplode(col("bhs")))
      .toDF("doc_id", "bitmap", "band", "bh")
      .cache()
    time("banded")(banded.count())

    val jac = graft.functions.VectorFunctions.bitmapJaccard(col("x.bitmap"), col("y.bitmap"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
    println(s"[prof] raw candidates = ${time("raw cand count")(cand.count())}")
    val verified = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id") && jac >= lit(0.24995))
      .select(col("x.doc_id").as("src"), col("y.doc_id").as("dst"))
      .distinct()
      .cache()
    println(s"[prof] verified pairs = ${time("verify")(verified.count())}")

    val sym = verified.union(verified.select(col("dst").as("src"), col("src").as("dst"))).cache()
    time("sym")(sym.count())
    val labels = graft.operators.Closure.minLabel(
      docs.select(col("doc_id").as("id")), sym, rounds = 6)
    time("closure")(labels.write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
