package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted 5-gram stupid-backoff LM — the build-once / score-many
  * lifecycle behind `q_text_perplexity5` (the in-query path trains the
  * model inline so the DuckDB oracle can replay it; production trains
  * ONCE on a curated slice and scores every crawl snapshot against the
  * stored artifact — CCNet's actual shape: one KenLM per language,
  * reused across every CommonCrawl dump):
  *
  *   t5,t4,t3/   pruned gram tables (count >= 2 — the KenLM memory trick;
  *               singleton mass dominates the high orders at web scale)
  *   c4,c3,c2/   unpruned context tables for the hit-level numerators
  *   t2,uni/     the dense low-order backoff floor
  *   total/      one row, the floor-log2 of the train token count
  *
  * Publishing is atomic (aside + rename + rollback, the [[VectorIndex]]
  * discipline); scoring reads the stored tables only — a crawl snapshot
  * is scored in O(delta) with six linear equi-joins on the gram keys and
  * NO access to the training corpus. Tombstones do not apply: an LM is a
  * trained aggregate, not per-document state (erasing a training doc
  * means retraining, which [[buildLm]] is — the same stance the vector
  * codebooks take).
  *
  * The integer floor-log2 scoring device, the backoff ladder (+4 bits per
  * level), and the positional-count edge-effect choice are all shared
  * with the in-query path — TextQueries delegates here, so the stored
  * and inline scores are the same code, not copies. */
object LanguageModel {

  /** The nine model frames. Grams count POSITIONALLY from the quint frame
    * (orders 2-5); unigrams/total from the full token stream — the same
    * edge-effect choice the trigram gate makes. */
  final case class LmTables(
      t5: DataFrame, c4: DataFrame, t4: DataFrame, c3: DataFrame,
      t3: DataFrame, c2: DataFrame, t2: DataFrame, uni: DataFrame,
      total: DataFrame)

  private def lgOf(n: Column): Column = (length(bin(n)) - 1).cast("long")

  private def withWs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))

  /** The (doc_id, a..e) sliding 5-gram frame of a document table. */
  def quintsOf(docs: DataFrame): DataFrame =
    withWs(docs).filter(size(col("ws")) >= 5)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 4),
          i => struct(
            element_at(col("ws"), i).as("a"),
            element_at(col("ws"), i + 1).as("b"),
            element_at(col("ws"), i + 2).as("c"),
            element_at(col("ws"), i + 3).as("d"),
            element_at(col("ws"), i + 4).as("e")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"),
        col("p.c").as("c"), col("p.d").as("d"), col("p.e").as("e"))

  /** Train the model tables from a document table (doc_id, text). Pruning
    * happens AT the count aggregation — pruned grams never leave the
    * shuffle that counts them.
    *
    * Shape (r18 optimization round): ONE corpus-scan 5-gram aggregation
    * (`g5`, unpruned counts), then every lower-order table is a ROLLUP of
    * counts already aggregated — sum over the dropped key position equals
    * the direct positional count by commutativity, so the outputs are
    * bit-identical while the corpus is tokenized + exploded into 5-grams
    * once instead of once per table (7 scans → 1), and each rollup
    * shuffles the already-aggregated gram table instead of the corpus
    * (guide §2.3 "aggregate before you shuffle"). The unigram table
    * likewise feeds the total (token count = Σ unigram counts), so the
    * token stream is scanned once instead of twice. */
  def tablesFrom(trainDocs: DataFrame): LmTables = {
    // NOT cached, but still computed once (r19): the scoring joins push
    // per-branch isnotnull filters down into each rollup's copy of this
    // subtree, which would de-canonicalize the otherwise-identical g5
    // exchanges and defeat exchange reuse (r18 measured x11 → x17 executed
    // exchanges). r18 fixed that with .cache(), but materializing the
    // unpruned distinct-5-gram InMemoryRelation cost MORE than the saved
    // scans (q_text_perplexity5 isolated 2.6 → 4.6 s, r18 verdict). The
    // no-op isnotnull pre-filter below (split() never yields null tokens)
    // plants the same constraint in EVERY branch, so the pushed per-branch
    // filters are pruned as implied and the branches stay canonical —
    // exchange reuse computes the 5-gram shuffle once with zero
    // materialization and nothing left pinned in the storage pool.
    val uniN = withWs(trainDocs)
      .select(explode(col("ws")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("n"))
    val g5 = quintsOf(trainDocs)
      .filter(col("a").isNotNull && col("b").isNotNull && col("c").isNotNull &&
        col("d").isNotNull && col("e").isNotNull)
      .groupBy("a", "b", "c", "d", "e").agg(count(lit(1)).as("n"))
    def roll(src: DataFrame, keys: String*) =
      src.groupBy(keys.map(col): _*).agg(sum("n").as("n"))
    def prunedOf(src: DataFrame, keys: Seq[String], out: String) =
      src.filter(col("n") >= 2)
        .select(keys.map(col) :+ lgOf(col("n")).as(out): _*)
    def ctxOf(src: DataFrame, keys: Seq[String], out: String) =
      src.select(keys.map(col) :+ lgOf(col("n")).as(out): _*)
    // every rollup derives DIRECTLY from g5 (depth 2), not from each other:
    // chained rollups would serialize the stage DAG (each level waits on
    // the previous), while independent rollups of the one shared g5
    // exchange run in parallel — same single corpus scan either way
    LmTables(
      t5 = prunedOf(g5, Seq("a", "b", "c", "d", "e"), "lg5"),
      c4 = ctxOf(roll(g5, "a", "b", "c", "d"), Seq("a", "b", "c", "d"), "lg_abcd"),
      t4 = prunedOf(roll(g5, "b", "c", "d", "e"), Seq("b", "c", "d", "e"), "lg_bcde"),
      c3 = ctxOf(roll(g5, "b", "c", "d"), Seq("b", "c", "d"), "lg_bcd"),
      t3 = prunedOf(roll(g5, "c", "d", "e"), Seq("c", "d", "e"), "lg_cde"),
      c2 = ctxOf(roll(g5, "c", "d"), Seq("c", "d"), "lg_cd"),
      t2 = ctxOf(roll(g5, "d", "e"), Seq("d", "e"), "lg_de"),
      uni = uniN.select(col("w"), lgOf(col("n")).as("lg_u")),
      // coalesce keeps the empty-train edge identical to the old
      // count(*)-based total (count of zero rows = 0, sum of zero rows = NULL)
      total = uniN.agg(lgOf(coalesce(sum("n"), lit(0L))).as("lg_t")))
  }

  /** Score a document table against model tables: per-doc 5-gram count,
    * total backoff bits, and integer centibit perplexity — the
    * `q_text_perplexity5` output shape. */
  def score(docs: DataFrame, m: LmTables): DataFrame =
    quintsOf(docs)
      .join(m.t5, Seq("a", "b", "c", "d", "e"), "left")
      .join(m.c4, Seq("a", "b", "c", "d"), "left")
      .join(m.t4, Seq("b", "c", "d", "e"), "left")
      .join(m.c3, Seq("b", "c", "d"), "left")
      .join(m.t3, Seq("c", "d", "e"), "left")
      .join(m.c2, Seq("c", "d"), "left")
      .join(m.t2, Seq("d", "e"), "left")
      .join(m.uni.select(col("w").as("d"), col("lg_u").as("lg_ud")), Seq("d"), "left")
      .join(m.uni.select(col("w").as("e"), col("lg_u").as("lg_ue")), Seq("e"), "left")
      .crossJoin(broadcast(m.total))
      .select(col("doc_id"),
        when(col("lg5").isNotNull, coalesce(col("lg_abcd"), lit(0L)) - col("lg5"))
          .otherwise(when(col("lg_bcde").isNotNull,
            coalesce(col("lg_bcd"), lit(0L)) - col("lg_bcde") + lit(4L))
            .otherwise(when(col("lg_cde").isNotNull,
              coalesce(col("lg_cd"), lit(0L)) - col("lg_cde") + lit(8L))
              .otherwise(when(col("lg_de").isNotNull,
                coalesce(col("lg_ud"), lit(0L)) - col("lg_de") + lit(12L))
                .otherwise(when(col("lg_ue").isNotNull,
                  col("lg_t") - col("lg_ue") + lit(16L))
                  .otherwise(col("lg_t") + lit(16L)))))).as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_5grams"), sum("bits").as("bits"))
      .withColumn("ppl_cb", expr("bits * 100 div n_5grams"))
      .select("doc_id", "n_5grams", "bits", "ppl_cb")

  // ---------------------------------------------------------------------
  // persisted lifecycle
  // ---------------------------------------------------------------------

  private val TableNames =
    Seq("t5", "c4", "t4", "c3", "t3", "c2", "t2", "uni", "total")

  private def fsOf(spark: SparkSession, dir: Path): FileSystem =
    FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)

  /** Train on `trainDocs` and atomically publish under `lmDir`. */
  def buildLm(spark: SparkSession, trainDocs: DataFrame, lmDir: String): Unit = {
    val dir = new Path(lmDir)
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(tmp, true)
    val m = tablesFrom(trainDocs)
    val frames = Seq(m.t5, m.c4, m.t4, m.c3, m.t3, m.c2, m.t2, m.uni, m.total)
    TableNames.zip(frames).foreach { case (n, f) =>
      f.write.mode(SaveMode.Overwrite).parquet(s"$tmp/$n")
    }
    fs.delete(aside, true)
    if (fs.exists(dir) && !fs.rename(dir, aside))
      throw new java.io.IOException(s"language model: cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.exists(aside) && fs.rename(aside, dir)
      throw new java.io.IOException(s"language model: swap failed for $dir, " +
        (if (rolledBack) "rolled back to the previous model"
         else s"no previous model to roll back to (or rollback failed - see $aside)"))
    }
    fs.delete(aside, true)
  }

  /** The stored model tables. */
  def lmTables(spark: SparkSession, lmDir: String): LmTables = {
    def r(n: String) = spark.read.parquet(s"$lmDir/$n")
    LmTables(r("t5"), r("c4"), r("t4"), r("c3"), r("t3"), r("c2"), r("t2"),
      r("uni"), r("total"))
  }

  /** Score any document table against the STORED model — O(delta), no
    * retrain, no access to the training corpus. */
  def scoreAgainstLm(spark: SparkSession, docs: DataFrame, lmDir: String): DataFrame =
    score(docs, lmTables(spark, lmDir))
}
