package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * DISTINCT novel word (vocabulary-sized, never corpus-sized) — the same
  * bounded-driver-compute argument the trainer itself rests on. */
object Tokenizer {

  /** The greedy left-to-right merge fold — shared by the trainer and the
    * novel-word encode kernel: the accumulated last symbol blocks chain
    * re-merging within one pass. */
  private[graft] def applyMergeScala(syms: Array[String], l: String, r: String): Array[String] = {
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

  /** The trainer (shared verbatim by the q_text_bpe_train family —
    * TextQueries delegates here): ONE distributed aggregate collapses the
    * corpus to the word-frequency table — the only corpus-sized stage —
    * and the greedy merge loop (count adjacent symbol pairs, take the top
    * pair by count desc then lexicographic, apply, recount) runs on the
    * DRIVER over that bounded table, exactly how production tokenizer
    * trainers work (HuggingFace/SentencePiece load word counts in memory;
    * GPT-2's merges.txt came from this shape). The previous implementation
    * re-counted pairs distributively: 2 Spark jobs per merge made the
    * 256-merge query the whole gate's dominant cost (15.9 s isolated at
    * sf0.1 — r7 bench) for work that is VOCABULARY-sized by construction;
    * the driver loop does identical arithmetic in-process in well under a
    * second. Merges and final symbolizations are bit-identical (the loop
    * applies [[applyMergeScala]], the pinned twin of the old Column fold),
    * so the recursive-CTE DuckDB oracles replay unchanged. The collect is
    * bounded by DISTINCT WORDS, not corpus rows; at web scale cap the
    * vocabulary with `minFreq` — words below the frequency floor are
    * dropped BEFORE the driver collect (standard tokenizer-trainer
    * practice: rare words carry negligible pair mass but dominate distinct
    * counts under Zipf), so the collected table is bounded by the
    * operator's dial, never the data volume. The default (1) keeps every
    * word — the oracle-mirrored gate configuration.
    * Returns (final vocab (w, n, s), ordered merge list (step, l, r, cnt)). */
  def trainLoop(words: DataFrame, nMerges: Int, minFreq: Long = 1L)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    val spark = words.sparkSession
    import spark.implicits._
    val wordCounts: Array[(String, Long)] = words
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minFreq) // map-side-combined HAVING: the cap runs distributed
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1) // collect order is nondeterministic; the loop's sums are not
    val syms: Array[Array[String]] = wordCounts.map(_._1.map(_.toString).toArray)
    val merges = scala.collection.mutable.Buffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to nMerges if !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val ss = syms(wi)
        val n = wordCounts(wi)._2
        var i = 0
        while (i < ss.length - 1) {
          val k = (ss(i), ss(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        // top pair: count desc, then (l, r) lexicographic — the exact
        // orderBy(desc(cnt), asc(l), asc(r)).take(1) of the distributed loop
        val ((l, r), cnt) = counts.minBy { case ((pl, pr), c) => (-c, pl, pr) }
        merges += ((step.toLong, l, r, cnt))
        var wj = 0
        while (wj < syms.length) { syms(wj) = applyMergeScala(syms(wj), l, r); wj += 1 }
      }
    }
    val vocab = wordCounts.iterator.zip(syms.iterator)
      .map { case ((w, n), ss) => (w, n, ss.mkString(" ")) }
      .toSeq.toDF("w", "n", "s")
    (vocab, merges.toSeq)
  }

  private def fsOf(spark: SparkSession, dir: Path): FileSystem =
    FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)

  /** Train on a document table (doc_id, text) and atomically publish the
    * merge table + vocab cache under `tokDir`. */
  def buildTokenizer(
      spark: SparkSession, docs: DataFrame, tokDir: String,
      nMerges: Int = 256, minFreq: Long = 1L): Unit = {
    import spark.implicits._
    val dir = new Path(tokDir)
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(tmp, true)
    val (vocab, merges) = trainLoop(
      docs.select(explode(split(col("text"), " ")).as("w")), nMerges, minFreq)
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
