package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the build-once / search-many lifecycle that
  * makes index training amortize. `q_sim_ivfpq` retrains inside the query
  * (so the oracle can replay the whole lifecycle); a production deployment
  * trains ONCE and serves every subsequent search from four stored tables:
  *
  *   coarse/        trained coarse codebook (cent_id, cemb, norm2_micro)
  *   cells/         corpus coarse assignment (vec_id, cell)
  *   pq_codebook/   trained sub-codebooks (m, cent_id, cm)
  *   codes/         corpus PQ codes (vec_id, m, cent_id) — 8 codes/vector
  *
  * At 100 TB the stored footprint is what matters: `codes` + `cells` are a
  * few bytes per vector (vs 512 for raw doubles), the codebooks are
  * constant-size broadcasts, and a search touches nprobe/NCells of the
  * codes. The index publishes ATOMICALLY: tables build under a hidden
  * `.building` sibling, then one rename — searchers see the old index or
  * the new one, never a half-written mix (same discipline as the lake
  * maintenance operators). QuantSpec pins that a search served from the
  * stored index is row-identical to the in-query training path. */
object VectorIndex {

  import graft.queries.QuantQueries._

  /** Train on vectors with `vec_id < trainBound` and atomically publish the
    * index under `indexDir` (default: the whole corpus). A one-row `meta`
    * table records the EFFECTIVE training boundary (min(trainBound,
    * max indexed id + 1)) — the stable reference point
    * [[driftRatio]]-driven rebuild decisions need after any number of
    * appends. */
  def buildIvfPq(
      spark: SparkSession, sfDir: String, indexDir: String,
      trainBound: Long = Long.MaxValue): Unit = {
    val dir = new Path(indexDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)

    val e = normalizedEmbeddings(spark, sfDir).filter(col("vec_id") < trainBound).cache()
    val c2 = trainedCodebook(e).cache()
    val em = microEmbeddings(spark, sfDir).filter(col("vec_id") < trainBound)
    val subs = subVectors(em).cache()
    val pqc1 = pqCodebook(subs, em).cache()

    c2.write.mode(SaveMode.Overwrite).parquet(s"$tmp/coarse")
    kmeansAssign(e, c2).select(col("vec_id"), col("cent_id").as("cell"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/cells")
    pqc1.write.mode(SaveMode.Overwrite).parquet(s"$tmp/pq_codebook")
    pqAssign(subs, pqc1).select("vec_id", "m", "cent_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/codes")
    e.agg(least(lit(trainBound), max(col("vec_id")) + 1L).as("train_bound"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/meta")
    Seq(e, c2, subs, pqc1).foreach(_.unpersist())

    // same aside + swap + rollback discipline as appendIvfPq: a rebuild over
    // an existing index must never pass through a state where the old index
    // is gone and the new one is not yet in place
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(aside, true)
    if (fs.exists(dir) && !fs.rename(dir, aside))
      throw new java.io.IOException(s"vector index: cannot move $indexDir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.exists(aside) && fs.rename(aside, dir)
      throw new java.io.IOException(
        s"vector index: swap failed for $indexDir, " +
          (if (rolledBack) "rolled back to the previous index"
           else s"no previous index to roll back to (or rollback failed - see $aside)"))
    }
    fs.delete(aside, true)
  }

  /** Copy the one-row `meta` table into a staging dir (absent on indexes
    * built before meta existed — tolerated). */
  private def copyMetaIfPresent(
      spark: SparkSession, fs: FileSystem, indexDir: String, tmp: Path): Unit = {
    val meta = new Path(s"$indexDir/meta")
    if (fs.exists(meta))
      spark.read.parquet(meta.toString)
        .write.mode(SaveMode.Overwrite).parquet(s"$tmp/meta")
  }

  /** The effective training boundary recorded at build time — every vec_id
    * at or past it was encoded with codebooks that never saw it. */
  def trainBoundOf(spark: SparkSession, indexDir: String): Long =
    spark.read.parquet(s"$indexDir/meta").head().getLong(0)

  /** Append vectors with `vec_id >= minVecId` to a published index WITHOUT
    * retraining: the delta is assigned and encoded with the STORED
    * codebooks — production semantics, where appends run continuously and
    * codebooks go stale gradually until a scheduled rebuild — and the
    * extended index publishes through the same hidden-dir + rename swap,
    * so searchers see the old index or the extended one, never a mix.
    * Delta work is O(delta x codebook): the existing corpus is copied
    * through (at 100 TB the copy becomes a metadata move in a table
    * format; the training/encoding cost — the expensive part — is
    * delta-only either way). */
  def appendIvfPq(
      spark: SparkSession, sfDir: String, indexDir: String, minVecId: Long): Unit = {
    val dir = new Path(indexDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(tmp, true)
    fs.delete(aside, true)

    val coarse = spark.read.parquet(s"$indexDir/coarse").cache()
    val pqc1 = spark.read.parquet(s"$indexDir/pq_codebook").cache()
    // idempotent replay guard: if a crash landed AFTER the publish but before
    // the caller observed it, re-running the same append must not union the
    // delta's rows in twice (duplicate codes double ADC sums and corrupt
    // rankings) — the old side keeps only rows below the delta boundary
    val oldCells = spark.read.parquet(s"$indexDir/cells").filter(col("vec_id") < minVecId)
    val oldCodes = spark.read.parquet(s"$indexDir/codes").filter(col("vec_id") < minVecId)

    val e = normalizedEmbeddings(spark, sfDir).filter(col("vec_id") >= minVecId)
    val subs = subVectors(microEmbeddings(spark, sfDir).filter(col("vec_id") >= minVecId))
    val newCells = kmeansAssign(e, coarse).select(col("vec_id"), col("cent_id").as("cell"))
    val newCodes = pqAssign(subs, pqc1).select("vec_id", "m", "cent_id")

    coarse.write.mode(SaveMode.Overwrite).parquet(s"$tmp/coarse")
    pqc1.write.mode(SaveMode.Overwrite).parquet(s"$tmp/pq_codebook")
    oldCells.unionByName(newCells).write.mode(SaveMode.Overwrite).parquet(s"$tmp/cells")
    oldCodes.unionByName(newCodes).write.mode(SaveMode.Overwrite).parquet(s"$tmp/codes")
    copyMetaIfPresent(spark, fs, indexDir, tmp)
    coarse.unpersist()
    pqc1.unpersist()

    if (!fs.rename(dir, aside))
      throw new java.io.IOException(s"vector index: cannot move $indexDir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.rename(aside, dir)
      throw new java.io.IOException(
        s"vector index: swap failed for $indexDir, " +
          (if (rolledBack) "rolled back to the previous index"
           else s"ROLLBACK ALSO FAILED - previous index preserved at $aside"))
    }
    fs.delete(aside, true)
  }

  /** Serve an IVF-PQ search for query vectors `vec_id < nQueries` entirely
    * from the stored index (plus one scan of the query vectors themselves).
    * Identical ranking semantics to `q_sim_ivfpq`. */
  def searchIvfPq(
      spark: SparkSession,
      sfDir: String,
      indexDir: String,
      nQueries: Int = 5,
      nprobe: Int = 3,
      k: Int = 5): DataFrame = {
    val coarse = spark.read.parquet(s"$indexDir/coarse")
    val cells = spark.read.parquet(s"$indexDir/cells")
    val pqc1 = spark.read.parquet(s"$indexDir/pq_codebook")
    val codes = spark.read.parquet(s"$indexDir/codes")

    val wProbe = Window.partitionBy("query_id").orderBy(desc("csim"), asc("cent_id"))
    val probes = normalizedEmbeddings(spark, sfDir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
      .crossJoin(broadcast(coarse.select(col("cent_id"), col("cemb"))))
      .select(col("query_id"), col("cent_id"),
        round(graft.functions.VectorFunctions.dot(col("qemb"), col("cemb")), 6).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cent_id").as("cell"))
    val qTable = subVectors(microEmbeddings(spark, sfDir))
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("m"), col("sub"))
      .join(broadcast(pqc1), "m")
      .select(col("query_id"), col("m"), col("cent_id"),
        subDist(col("sub"), col("cm")).as("qdist"))
    val w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
      .join(codes, "vec_id")
      .join(broadcast(qTable), Seq("query_id", "m", "cent_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("qdist").as("adc_dist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Residual-PQ index build (FAISS `by_residual=true`, its default): same
    * four stored tables as [[buildIvfPq]], but `pq_codebook`/`codes`
    * quantize (x - assigned coarse centroid) instead of x — lower
    * quantization error at identical storage (pinned in QuantSpec against
    * the no-residual path). The coarse table's exact integer micro
    * components (`cmm`) make the residual computation exact BIGINT math at
    * build AND serve time. Same atomic aside+rename publish. */
  def buildIvfPqResidual(
      spark: SparkSession, sfDir: String, indexDir: String,
      trainBound: Long = Long.MaxValue): Unit = {
    val dir = new Path(indexDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    fs.delete(tmp, true)

    val e = normalizedEmbeddings(spark, sfDir).filter(col("vec_id") < trainBound).cache()
    val c2 = trainedCodebook(e).cache()
    val cells = kmeansAssign(e, c2).select(col("vec_id"), col("cent_id").as("cell")).cache()
    val em = microEmbeddings(spark, sfDir).filter(col("vec_id") < trainBound)
    val resid = em.join(cells, "vec_id")
      .join(broadcast(c2.select(col("cent_id").as("cell"), col("cmm"))), "cell")
      .select(col("vec_id"), zip_with(col("xm"), col("cmm"), (x, c) => x - c).as("xm"))
      .cache()
    val subs = subVectors(resid).cache()
    val pqc1 = pqCodebook(subs, resid).cache()

    c2.write.mode(SaveMode.Overwrite).parquet(s"$tmp/coarse")
    cells.write.mode(SaveMode.Overwrite).parquet(s"$tmp/cells")
    pqc1.write.mode(SaveMode.Overwrite).parquet(s"$tmp/pq_codebook")
    pqAssign(subs, pqc1).select("vec_id", "m", "cent_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/codes")
    Seq(e, c2, cells, resid, subs, pqc1).foreach(_.unpersist())

    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(aside, true)
    if (fs.exists(dir) && !fs.rename(dir, aside))
      throw new java.io.IOException(s"vector index: cannot move $indexDir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.exists(aside) && fs.rename(aside, dir)
      throw new java.io.IOException(
        s"vector index: swap failed for $indexDir, " +
          (if (rolledBack) "rolled back to the previous index"
           else s"no previous index to roll back to (or rollback failed - see $aside)"))
    }
    fs.delete(aside, true)
  }

  /** Serve a residual-PQ search from an index built by
    * [[buildIvfPqResidual]] — identical ranking semantics to
    * `q_sim_ivfpq_residual` (per-probed-cell query residual tables,
    * integer ADC). */
  def searchIvfPqResidual(
      spark: SparkSession,
      sfDir: String,
      indexDir: String,
      nQueries: Int = 5,
      nprobe: Int = 3,
      k: Int = 5): DataFrame = {
    val coarse = spark.read.parquet(s"$indexDir/coarse")
    val cells = spark.read.parquet(s"$indexDir/cells")
    val pqc1 = spark.read.parquet(s"$indexDir/pq_codebook")
    val codes = spark.read.parquet(s"$indexDir/codes")

    val wProbe = Window.partitionBy("query_id").orderBy(desc("csim"), asc("cent_id"))
    val probes = normalizedEmbeddings(spark, sfDir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
      .crossJoin(broadcast(coarse.select(col("cent_id"), col("cemb"))))
      .select(col("query_id"), col("cent_id"),
        round(graft.functions.VectorFunctions.dot(col("qemb"), col("cemb")), 6).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cent_id").as("cell"))
    val qResid = probes
      .join(microEmbeddings(spark, sfDir).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("xm").as("qxm")), "query_id")
      .join(broadcast(coarse.select(col("cent_id").as("cell"), col("cmm"))), "cell")
      .select(col("query_id"), col("cell"),
        zip_with(col("qxm"), col("cmm"), (x, c) => x - c).as("xm"))
    val qSubs = qResid.select(
        col("query_id"), col("cell"),
        posexplode(transform(
          sequence(lit(0), lit(PqM - 1)),
          m => slice(col("xm"), m * PqSubDim + 1, lit(PqSubDim)))))
      .toDF("query_id", "cell", "m", "sub")
    val qTable = qSubs.join(broadcast(pqc1), "m")
      .select(col("query_id"), col("cell"), col("m"), col("cent_id"),
        subDist(col("sub"), col("cm")).as("qdist"))
    val w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "cell", "vec_id")
      .join(codes, "vec_id")
      .join(broadcast(qTable), Seq("query_id", "cell", "m", "cent_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("qdist").as("adc_dist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Two-stage stored-index search: ADC shortlist of `kPrime`, then exact
    * cosine re-rank to `k` (FAISS `IndexRefineFlat`) — the recall fix every
    * production IVF-PQ deployment runs, since ADC alone caps recall@k at the
    * quantization error. The refine stage reads exactly kPrime raw vectors
    * per query (shortlist broadcasts into one corpus scan); identical
    * ranking semantics to `q_sim_ivfpq_rerank`. */
  def searchIvfPqRerank(
      spark: SparkSession,
      sfDir: String,
      indexDir: String,
      nQueries: Int = 5,
      nprobe: Int = 3,
      k: Int = 5,
      kPrime: Int = graft.queries.QuantQueries.RerankKPrime): DataFrame =
    refine(spark, sfDir,
      searchIvfPq(spark, sfDir, indexDir, nQueries, nprobe, kPrime), nQueries, k)

  /** The full FAISS-default serving stack: residual ADC shortlist
    * ([[searchIvfPqResidual]] over a [[buildIvfPqResidual]] index) refined
    * by exact distance — by_residual=true + IndexRefineFlat composed. */
  def searchIvfPqResidualRerank(
      spark: SparkSession,
      sfDir: String,
      indexDir: String,
      nQueries: Int = 5,
      nprobe: Int = 3,
      k: Int = 5,
      kPrime: Int = graft.queries.QuantQueries.RerankKPrime): DataFrame =
    refine(spark, sfDir,
      searchIvfPqResidual(spark, sfDir, indexDir, nQueries, nprobe, kPrime), nQueries, k)

  /** Exact re-rank of an ADC shortlist: the (k' x queries)-row shortlist
    * broadcasts into one pass over the raw vectors; only shortlisted
    * vectors are ever decoded. */
  private def refine(
      spark: SparkSession, sfDir: String, shortlistRanked: DataFrame,
      nQueries: Int, k: Int): DataFrame = {
    val shortlist = shortlistRanked.select(col("query_id"), col("neighbor_id"))
    val e = normalizedEmbeddings(spark, sfDir)
    val qv = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))
    e.select(col("vec_id").as("neighbor_id"), col("emb"))
      .join(broadcast(shortlist), "neighbor_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.VectorFunctions.dot(col("emb"), col("qemb")), 6).as("score"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Targeted vector erasure — the index half of a GDPR delete (the table
    * half is [[Merge.deletePartitioned]]; an erased user's embedding must
    * stop being FINDABLE, not merely stop being stored): drop the ids'
    * rows from `cells` and `codes` via broadcast anti-joins (the tombstone
    * set is small; the corpus tables rewrite in one linear pass) and
    * republish through the same aside + rename + rollback swap — searchers
    * see the old index or the purged one, never a mix. Codebooks are
    * UNCHANGED: a handful of erasures does not shift the trained
    * distribution (that is [[driftRatio]]'s job to notice over time).
    * Idempotent by construction — absent ids anti-join to nothing.
    * Returns the number of vectors actually removed. */
  def deleteFromIndex(
      spark: SparkSession, indexDir: String, vecIds: Seq[Long]): Long = {
    import spark.implicits._
    val dir = new Path(indexDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(tmp, true)
    fs.delete(aside, true)

    val tombstones = broadcast(vecIds.toDF("vec_id"))
    val oldCells = spark.read.parquet(s"$indexDir/cells")
    val nDead = oldCells.join(tombstones, Seq("vec_id"), "left_semi").count()
    if (nDead == 0L) return 0L

    spark.read.parquet(s"$indexDir/coarse")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/coarse")
    spark.read.parquet(s"$indexDir/pq_codebook")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/pq_codebook")
    oldCells.join(tombstones, Seq("vec_id"), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/cells")
    spark.read.parquet(s"$indexDir/codes").join(tombstones, Seq("vec_id"), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/codes")
    copyMetaIfPresent(spark, fs, indexDir, tmp)

    if (!fs.rename(dir, aside))
      throw new java.io.IOException(s"vector index: cannot move $indexDir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.rename(aside, dir)
      throw new java.io.IOException(
        s"vector index: swap failed for $indexDir, " +
          (if (rolledBack) "rolled back to the previous index"
           else s"ROLLBACK ALSO FAILED - previous index preserved at $aside"))
    }
    fs.delete(aside, true)
    nDead
  }

  /** Index small-file compaction — the [[Compaction]] analogue for the
    * index: every [[appendIvfPq]] (and each streaming maintenance batch)
    * rewrites `cells`/`codes` as a fresh file set, so a long-lived index
    * accumulates small files and pays listing + open overhead on every
    * search. Rewrites the two data tables coalesced to `targetFiles`
    * (codebooks copied through — they are constant-size) and republishes
    * through the same aside + rename + rollback swap; rows are untouched,
    * so searches before and after are identical. Run it on the same cadence
    * as table compaction. */
  def vacuumIndex(spark: SparkSession, indexDir: String, targetFiles: Int = 4): Unit = {
    val dir = new Path(indexDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, s".${dir.getName}.building")
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    fs.delete(tmp, true)
    fs.delete(aside, true)

    spark.read.parquet(s"$indexDir/coarse")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/coarse")
    spark.read.parquet(s"$indexDir/pq_codebook")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/pq_codebook")
    spark.read.parquet(s"$indexDir/cells").repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/cells")
    spark.read.parquet(s"$indexDir/codes").repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/codes")
    copyMetaIfPresent(spark, fs, indexDir, tmp)

    if (!fs.rename(dir, aside))
      throw new java.io.IOException(s"vector index: cannot move $indexDir aside")
    if (!fs.rename(tmp, dir)) {
      val rolledBack = fs.rename(aside, dir)
      throw new java.io.IOException(
        s"vector index: swap failed for $indexDir, " +
          (if (rolledBack) "rolled back to the previous index"
           else s"ROLLBACK ALSO FAILED - previous index preserved at $aside"))
    }
    fs.delete(aside, true)
  }

  /** Rebuild trigger: when the appended delta's mean PQ quantization error
    * exceeds this multiple of the base slice's, the stored codebooks no
    * longer fit the incoming distribution — schedule [[buildIvfPq]]. 1.5x is
    * a loose production default: iid appends sit near 1.0, a genuine
    * distribution shift (new embedding model, new domain) jumps well past
    * 2x, so the threshold separates the two regimes with margin. */
  val DriftRebuildThreshold = 1.5

  /** Mean PQ quantization error (exact integer squared L2 to the assigned
    * sub-centroid, per vector) of the delta (`vec_id >= minVecId`) encoded
    * with the STORED codebooks, as a ratio over the base slice's — the
    * staleness signal for appendIvfPq's stale-until-rebuild semantics (the
    * drift accounting itself is the `q_index_drift` oracle query). One
    * linear pass over the corpus against a broadcast codebook. Returns 1.0
    * when there is no delta. */
  def driftRatio(
      spark: SparkSession, sfDir: String, indexDir: String, minVecId: Long): Double = {
    val pqc1 = spark.read.parquet(s"$indexDir/pq_codebook")
    val bySlice = pqAssign(subVectors(microEmbeddings(spark, sfDir)), pqc1)
      .groupBy((col("vec_id") >= minVecId).as("is_delta"))
      .agg(sum("dist").as("total_err"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getLong(1).toDouble / r.getLong(2)).toMap
    require(bySlice.contains(false), s"driftRatio: no base rows below vec_id $minVecId")
    bySlice.get(true).map(_ / bySlice(false)).getOrElse(1.0)
  }

  def needsRebuild(
      spark: SparkSession, sfDir: String, indexDir: String, minVecId: Long): Boolean =
    driftRatio(spark, sfDir, indexDir, minVecId) > DriftRebuildThreshold
}
