package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BPE tokenizer — the build-once / encode-many lifecycle behind
  * `q_text_bpe_train` / `q_text_bpe_apply` (the in-query paths train
  * inline so the DuckDB oracles can replay them; production trains ONCE
  * and tokenizes every batch forever after — nobody retrains a tokenizer
  * per crawl):
  *
  *   merges/  the ordered merge table (step, l, r, cnt) — THE artifact a
  *            tokenizer ships (GPT-2's merges.txt is exactly this)
  *   vocab/   the trained words' final symbolizations (w, n, s) — an
  *            encode CACHE for known words
  *
  * Publishing is atomic (aside + rename + rollback). Encoding a delta:
  * known words hit the stored vocab map through a word-keyed equi-join;
  * NOVEL words — the case the stored artifact exists for — replay the
  * ordered merge list with the exact greedy left-to-right fold the
  * trainer used. The novel-word fold is a Scala function over the
  * driver-collected merge list on purpose (the packBitmaps precedent):
  * the merge table is vocabulary-sized by construction (256-50k rows —
  * every real tokenizer loads it into memory), the fold runs once per
  * DISTINCT novel word (vocabulary-sized, never corpus-sized), and the
  * 256-deep nested-lambda Column equivalent is exactly the plan-growth
  * failure the trainer's checkpointing exists to avoid. */
object Tokenizer {

  /** Greedy left-to-right merge fold as a COLUMN (l/r fed from a broadcast
    * one-row frame — step-invariant codegen source, janino cache hits; see
    * the trainer below and PERF.md round-7). */
  private[graft] def applyMergeCol(symsStr: Column, l: Column, r: Column): Column = {
    val syms = split(symsStr, " ")
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      element_at(syms, 1),
      (acc, x) =>
        when(substring_index(acc, " ", -1) === l && x === r,
          concat(acc.substr(lit(1), length(acc) - length(l)), l, r))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** The same greedy fold in plain Scala — the novel-word encode kernel.
    * Bit-identical semantics to [[applyMergeCol]]: the accumulated last
    * symbol blocks chain re-merging within one pass. */
  private def applyMergeScala(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == l && syms(i) == r)
        out(out.length - 1) = l + r
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Encode one word with an ordered merge list: chars, then every merge
    * in training order. */
  private[graft] def encodeWord(w: String, merges: Seq[(String, String)]): Array[String] =
    merges.foldLeft(w.map(_.toString).toArray) {
      case (syms, (l, r)) => applyMergeScala(syms, l, r)
    }

  /** The trainer loop (shared verbatim by the q_text_bpe_train family —
    * TextQueries delegates here): count adjacent symbol pairs over the
    * word-frequency table, take the top pair (count desc, then
    * lexicographic), apply, recount. The corpus collapses to the distinct-
    * word table BEFORE the loop, so every iteration is vocabulary-sized;
    * `checkpointEvery` bounds lineage (the plan never carries more than K
    * folds). Returns (final vocab (w, n, s), ordered merge list). */
  /** Checkpoints taken by the most recent trainLoop call (initial + cadence
    * + final). Test-observable so the lineage-bound invariant — the plan
    * never carries more than `checkpointEvery` merge folds — is asserted
    * structurally instead of via a wall-clock ratio that flakes under
    * parallel-suite load (r7 verdict item 3). */
  private[graft] val lastRunCheckpoints = new java.util.concurrent.atomic.AtomicInteger(0)

  def trainLoop(
      words: DataFrame, nMerges: Int, checkpointEvery: Int = 1)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    val s = words.sparkSession
    lastRunCheckpoints.set(0)
    def ckpt(df: DataFrame): DataFrame = {
      lastRunCheckpoints.incrementAndGet(); df.localCheckpoint()
    }
    var vocab = words
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w"), col("n"),
        trim(regexp_replace(col("w"), "(.)", "$1 ")).as("s"))
    vocab = ckpt(vocab)
    val merges = scala.collection.mutable.Buffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to nMerges if !exhausted) {
      val withSyms = vocab.select(col("n"), split(col("s"), " ").as("sl"))
      val top = withSyms.filter(size(col("sl")) >= 2)
        .select(col("n"),
          explode(transform(sequence(lit(1), size(col("sl")) - 1),
            i => struct(
              element_at(col("sl"), i).as("l"),
              element_at(col("sl"), i + 1).as("r")))).as("p"))
        .select(col("n"), col("p.l").as("l"), col("p.r").as("r"))
        .groupBy("l", "r").agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .take(1).headOption
      top match {
        case Some(rw) =>
          val (l, r, cnt) = (rw.getString(0), rw.getString(1), rw.getLong(2))
          merges += ((step.toLong, l, r, cnt))
          val top1 = s.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row(l, r)),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("__l",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("__r",
                org.apache.spark.sql.types.StringType))))
          vocab = vocab.crossJoin(broadcast(top1))
            .withColumn("s", applyMergeCol(col("s"), col("__l"), col("__r")))
            .drop("__l", "__r")
          if (step % checkpointEvery == 0) vocab = ckpt(vocab)
        case None => exhausted = true
      }
    }
    (ckpt(vocab), merges.toSeq)
  }

  private def fsOf(spark: SparkSession, dir: Path): FileSystem =
    FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)

  /** Train on a document table (doc_id, text) and atomically publish the
    * merge table + vocab cache under `tokDir`. */
  def buildTokenizer(
      spark: SparkSession, docs: DataFrame, tokDir: String,
      nMerges: Int = 256, checkpointEvery: Int = 8): Unit = {
    import spark.implicits._
    val dir = new Path(tokDir)
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(tmp, true)
    val (vocab, merges) = trainLoop(
      docs.select(explode(split(col("text"), " ")).as("w")), nMerges, checkpointEvery)
    merges.toDF("step", "l", "r", "cnt")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/merges")
    vocab.write.mode(SaveMode.Overwrite).parquet(s"$tmp/vocab")
    fs.delete(aside, true)
    if (fs.exists(dir) && !fs.rename(dir, aside))
      throw new java.io.IOException(s"tokenizer: cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.exists(aside) && fs.rename(aside, dir)
      throw new java.io.IOException(s"tokenizer: swap failed for $dir, " +
        (if (rolledBack) "rolled back to the previous tokenizer"
         else s"no previous tokenizer to roll back to (or rollback failed - see $aside)"))
    }
    fs.delete(aside, true)
  }

  /** Tokenize a document table against the STORED artifact — the
    * `q_text_bpe_apply` output shape (per-doc word count, pre/post symbol
    * counts, compression bp), no retraining: known words hit the vocab
    * cache via a word-keyed equi-join; novel words replay the stored
    * merge list (ordered, driver-collected — vocabulary-sized) once per
    * DISTINCT novel word. */
  def encodeAgainst(spark: SparkSession, docs: DataFrame, tokDir: String): DataFrame = {
    val merges = spark.read.parquet(s"$tokDir/merges")
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val known = spark.read.parquet(s"$tokDir/vocab")
      .select(col("w"), size(split(col("s"), " ")).cast("long").as("n_sym"))
    val novelCount = udf((w: String) => encodeWord(w, merges).length.toLong)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    // distinct novel words encode once; the corpus-sized token stream only
    // ever joins on the word key (the q_text_surprisal shape)
    val novel = toks.select("w").distinct()
      .join(known.select("w"), Seq("w"), "left_anti")
      .withColumn("n_sym", novelCount(col("w")))
    toks
      .join(known.unionByName(novel), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_sym_pre"),
        sum(coalesce(col("n_sym"), length(col("w")).cast("long"))).cast("long")
          .as("n_sym_post"))
      .withColumn("compression_bp", expr("n_sym_post * 10000 div n_sym_pre"))
      .orderBy("doc_id")
  }
}
