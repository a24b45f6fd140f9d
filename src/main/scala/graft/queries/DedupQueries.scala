package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.t

/** Near-duplicate detection over `documents.text` — MinHash+LSH, SimHash,
  * and n-gram Jaccard. None is SQL-expressible in DuckDB, so these are
  * rows-only checked here and pinned by ScalaTest recall specs.
  *
  * Scale design (the whole point): never form all pairs. Every variant
  * produces candidates through an equi-join key (LSH band hash / simhash
  * chunk / shared shingle), so Spark executes a shuffled hash join on the
  * bucket key — linear in data + candidate pairs, not quadratic in rows.
  */
object DedupQueries {

  private val MinhashPerms = 32
  private val Bands = 4 // 4 bands x 8 rows: selective at the 0.9 verify threshold

  /** doc_id + distinct word-token set (the shingle set for unigram Jaccard).
    * The synthetic corpus's planted near-dups are word-SHUFFLES (identical
    * word sets, destroyed order), so unigram sets are the discriminating
    * shingle; its small vocabulary also makes the pairwise similarity graph
    * dense, which drives the design below. */
  private def docWordSets(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))

  /** MinHash signature: sig[i] = min over tokens of hash64(token, i).
    * Pure column expressions (nested higher-order functions), codegen'd. */
  private def minhashSig(ws: Column): Column =
    transform(
      sequence(lit(0), lit(MinhashPerms - 1)),
      i => array_min(transform(ws, w => xxhash64(w, i))))

  /** LSH band hashes: one 64-bit hash per band of 8 signature slots.
    * r=8 rows/band keeps candidate probability ~6% at j=0.6 while exact-set
    * duplicates (j=1.0) always collide — the right trade for a dense
    * similarity graph where loose bands flood candidates quadratically. */
  private def bandHashes(sig: Column): Column =
    transform(
      sequence(lit(0), lit(Bands - 1)),
      b => xxhash64(concat_ws("|", slice(sig, b * lit(8) + 1, lit(8))), b))

  /** Pack a set-valued column (array<string>) into a dense bitmap
    * (array<long>) via a broadcast vocabulary join (vocabularies here are
    * tiny by construction). Exact set ops then run through the codegen'd
    * popcount kernel (graft.functions.BitmapJaccard) instead of per-pair
    * array_intersect over strings. */
  private def packBitmaps(sets: DataFrame, setCol: String): DataFrame = {
    val vocab = sets.select(explode(col(setCol)).as("w")).distinct()
      .withColumn("bit", row_number().over(Window.orderBy("w")) - 1)
      .cache()
    // bitmap capacity derived from the DATA: a hard-coded cap would silently
    // drop vocabulary bits past it and corrupt every downstream Jaccard
    // (the count() action is over the tiny about-to-be-broadcast vocab)
    val nWords = math.max(1L, (vocab.count() + 63) / 64).toInt
    sets
      .select(col("doc_id"), explode(col(setCol)).as("w"))
      .join(broadcast(vocab), "w")
      .groupBy("doc_id")
      .agg(collect_list(col("bit")).as("bits"))
      .select(
        col("doc_id"),
        graft.functions.VectorFunctions.packBits(col("bits"), lit(nWords)).as("bitmap"))
  }

  /** The persistable signature table for INCREMENTAL dedup: one row per
    * (doc, band) with the band hash and the doc's word set. Computed once
    * per corpus and stored; a delta batch joins against it by (band, bh)
    * without ever rescanning or re-signing the corpus. */
  def minhashBandTable(wordSets: DataFrame): DataFrame =
    wordSets
      .select(col("doc_id"), col("ws"), posexplode(bandHashes(minhashSig(col("ws")))))
      .toDF("doc_id", "ws", "band", "bh")

  /** Incremental near-dedup: sign ONLY the delta, equi-join its bands
    * against the stored corpus table, verify candidates with exact set
    * Jaccard over the carried word sets. Work is O(delta + candidates) —
    * the corpus contributes only its matching band rows. (Candidates are
    * band-bounded, so the per-pair array intersect here is fine; the
    * packed-bitmap kernel variant needs a shared append-only vocabulary
    * store and is the upgrade once delta batches are large.) */
  def incrementalDups(deltaWordSets: DataFrame, corpusBands: DataFrame, threshold: Double = 0.9): DataFrame = {
    val deltaBands = minhashBandTable(deltaWordSets)
    val inter = size(array_intersect(col("x.ws"), col("y.ws"))).cast("double")
    deltaBands.as("x")
      .join(corpusBands.as("y"), col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .filter(inter / (size(col("x.ws")) + size(col("y.ws")) - inter) >= threshold)
      .select(col("x.doc_id").as("delta_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
      .orderBy("delta_id", "corpus_id")
  }

  /** MinHash+LSH near-dedup, keep-list semantics: shingle → minhash → band →
    * bucket-join candidates → exact-Jaccard verify (>= 0.9) → one row PER
    * DOCUMENT with its canonical (minimum-id verified neighbor) and a dup
    * flag. Linear output where an all-pairs listing would be quadratic in
    * cluster sizes — the shape a 100 TB dedup actually needs (the keep-list
    * joins back against the corpus as a semi/anti join). Candidates only
    * ever meet through equal band hashes; the wide `ws` column is joined
    * back only for the candidate set. Canonicalization is single-pass (min
    * direct neighbor), not a transitive closure — documented approximation. */
  private val minhashLsh = Q(
    "q_dedup_minhash",
    (s, d) => {
      val docs = docWordSets(s, d).cache()
      // bitmap travels WITH the band rows (it is a few machine words), so
      // verification is an in-place codegen filter on the self-join output —
      // the dense candidate set (millions of rows here) is never shuffled
      // again to look bitmaps up by doc_id.
      val packed = packBitmaps(docs, "ws")
      val banded = docs.join(packed, "doc_id")
        .select(col("doc_id"), col("bitmap"), posexplode(bandHashes(minhashSig(col("ws")))))
        .toDF("doc_id", "bitmap", "band", "bh")
        .cache()
      // no distinct: a pair colliding in k bands is verified k times, but
      // the popcount verify is ~free and the keep-list groupBy/min absorbs
      // duplicates — cheaper than shuffling millions of candidates to dedup
      val verified = banded.as("x")
        .join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .filter(graft.functions.VectorFunctions.bitmapJaccard(col("x.bitmap"), col("y.bitmap")) >= 0.9)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val sym = verified.union(verified.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      docs.select(col("doc_id"))
        .join(sym.groupBy(col("doc_a").as("doc_id")).agg(min("doc_b").as("min_nb")), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          least(col("doc_id"), coalesce(col("min_nb"), col("doc_id"))).as("canonical_id"))
        .withColumn("is_dup", col("canonical_id") < col("doc_id"))
        .orderBy("doc_id")
    },
    None)

  /** SimHash: 64-bit signature from per-token hash bit votes; near-dups =
    * pairs within Hamming distance 3, found by the pigeonhole banding trick
    * (4 chunks of 16 bits — distance ≤3 ⇒ at least one chunk equal). */
  private val simhash = Q(
    "q_dedup_simhash",
    (s, d) => {
      // signature via the codegen'd one-pass kernel (graft.functions.SimHash64);
      // the declarative twin (aggregate over sequence(0,63) x tokens) is
      // pinned equivalent in FunctionsSpec but interprets 64 lambda trees
      // per token per row
      val docs = docWordSets(s, d)
        .withColumn("hs", transform(col("ws"), w => xxhash64(w)))
        .withColumn("simhash", graft.functions.VectorFunctions.simhash64(col("hs")))
        .select("doc_id", "simhash")
        .cache()
      val chunked = docs.select(
        col("doc_id"), col("simhash"),
        posexplode(transform(
          sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("simhash"), c * lit(16)).bitwiseAND(lit(0xffffL)))))
        .toDF("doc_id", "simhash", "chunk", "cv")
      chunked.as("x")
        .join(chunked.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(
          col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
    None)

  /** n-gram (bigram-shingle) Jaccard pairs via bitmap set-similarity.
    *
    * An inverted-index self-join is the textbook plan, but this corpus's
    * tiny vocabulary (~900 possible bigrams) makes EVERY shingle a hot key —
    * the join degenerates to sum(df^2) ≈ quadratic with massive constant.
    * Instead: build the dense shingle vocabulary (distinct + row_number,
    * broadcast — it is tiny by construction), pack each document's shingle
    * set into a few 64-bit words, and verify pairs with the codegen'd
    * popcount kernel (graft.functions.BitmapJaccard) — exact, same result
    * set, ~2 orders of magnitude less work per pair. At corpus sizes where
    * all-pairs stops being viable (>>10^5 docs), an LSH band prefilter
    * (as in q_dedup_minhash) slots in front of the same verify kernel. */
  private val ngramJaccard = Q(
    "q_dedup_ngram",
    (s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          // guard: a 1-word doc makes sequence(0, -1) DESCEND ([0,-1]) and
          // element_at(words, 0) throw — such docs have no bigrams at all
          array_distinct(
            when(size(col("words")) >= 2,
              transform(
                sequence(lit(0), size(col("words")) - 2),
                i => concat_ws(" ", element_at(col("words"), i + 1), element_at(col("words"), i + 2))))
              .otherwise(array().cast("array<string>")))
            .as("shingles"))
      val packed = packBitmaps(docs, "shingles").cache()
      val a = packed.select(col("doc_id").as("doc_a"), col("bitmap").as("bm_a"))
      val b = packed.select(col("doc_id").as("doc_b"), col("bitmap").as("bm_b"))
      // the jaccard threshold lives IN the join condition (raw kernel value:
      // round(j,4) >= 0.25 ⟺ j >= 0.24995): the nested-loop join evaluates
      // the popcount kernel on the fly and only the ~0.1% surviving pairs
      // ever materialize as output rows — putting it in a post-join filter
      // instead copies both bitmaps into n²/2 UnsafeRows first, which
      // dominates the whole query. Survivors recompute j once for output.
      // deliberately NOT broadcast: measured at sf0.1, the CartesianProduct
      // the planner picks here (block-pair tasks over the cached packed
      // relation, 12 s) beats a forced BroadcastNestedLoopJoin (55 s, which
      // re-iterates the broadcast build side per stream row). Exact all-pairs
      // is this query's declared semantics; the LSH band prefilter
      // (q_dedup_minhash) is the scale path that replaces the pair source.
      a.join(b,
          col("doc_a") < col("doc_b") &&
            graft.functions.VectorFunctions.bitmapJaccard(col("bm_a"), col("bm_b")) >= 0.24995)
        .select(
          col("doc_a"), col("doc_b"),
          round(graft.functions.VectorFunctions.bitmapJaccard(col("bm_a"), col("bm_b")), 4)
            .as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    // exact semantics => full DuckDB oracle (the bitmap packing is an
    // implementation detail the oracle never sees)
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      d AS (SELECT doc_id,
              list_distinct(list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])) AS sh
            FROM w)
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
        FROM d a JOIN d b ON a.doc_id < b.doc_id) sub
      WHERE jaccard >= 0.25 ORDER BY doc_a, doc_b"""))

  val all: Seq[Q] = Seq(minhashLsh, simhash, ngramJaccard)
}
