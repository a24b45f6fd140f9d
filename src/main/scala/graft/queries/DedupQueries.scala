package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  private val Bands = 8 // 8 bands x 4 rows

  /** doc_id + distinct word-token set (the shingle set for unigram Jaccard). */
  private def docWordSets(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))

  /** MinHash signature: sig[i] = min over tokens of hash64(token, i).
    * Pure column expressions (nested higher-order functions), codegen'd. */
  private def minhashSig(ws: Column): Column =
    transform(
      sequence(lit(0), lit(MinhashPerms - 1)),
      i => array_min(transform(ws, w => xxhash64(w, i))))

  /** LSH band hashes: one 64-bit hash per band of 4 signature slots. */
  private def bandHashes(sig: Column): Column =
    transform(
      sequence(lit(0), lit(Bands - 1)),
      b => xxhash64(concat_ws("|", slice(sig, b * lit(4) + 1, lit(4))), b))

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash+LSH near-dup pairs: shingle → minhash → band → bucket-join →
    * exact-Jaccard verify. Candidates only ever meet through equal band
    * hashes; the wide `ws` column is joined back in only for the (small)
    * candidate set. */
  private val minhashLsh = Q(
    "q_dedup_minhash",
    (s, d) => {
      val docs = docWordSets(s, d).cache()
      val banded = docs
        .select(col("doc_id"), posexplode(bandHashes(minhashSig(col("ws")))))
        .toDF("doc_id", "band", "bh")
      val cand = banded.as("x")
        .join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(docs.select(col("doc_id").as("doc_a"), col("ws").as("ws_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("ws").as("ws_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), round(jaccard(col("ws_a"), col("ws_b")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
        .orderBy("doc_a", "doc_b")
    },
    None)

  /** SimHash: 64-bit signature from per-token hash bit votes; near-dups =
    * pairs within Hamming distance 3, found by the pigeonhole banding trick
    * (4 chunks of 16 bits — distance ≤3 ⇒ at least one chunk equal). */
  private val simhash = Q(
    "q_dedup_simhash",
    (s, d) => {
      val docs = docWordSets(s, d)
        .withColumn("hs", transform(col("ws"), w => xxhash64(w)))
        .withColumn(
          "simhash",
          aggregate(
            sequence(lit(0), lit(63)),
            lit(0L),
            (acc, b) =>
              acc + when(
                aggregate(
                  col("hs"),
                  lit(0L),
                  (v, h) => v + when(
                    call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
                call_function("shiftleft", lit(1L), b)).otherwise(0L)))
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

  /** n-gram (bigram-shingle) Jaccard via inverted index: explode shingles,
    * self-join on the shingle, count common per pair; |A∪B| = |A|+|B|−common.
    * Scale note: frequent-shingle hot keys are the hazard at 100 TB — cap
    * per-shingle fan-out (or pre-filter stop-shingles) before the join. */
  private val ngramJaccard = Q(
    "q_dedup_ngram",
    (s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          array_distinct(
            transform(
              sequence(lit(0), size(col("words")) - 2),
              i => concat_ws(" ", element_at(col("words"), i + 1), element_at(col("words"), i + 2))))
            .as("shingles"))
        .cache()
      val inv = docs.select(col("doc_id"), size(col("shingles")).as("n"), explode(col("shingles")).as("sh"))
      inv.as("x")
        .join(inv.as("y"), col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.n").as("na"), col("y.n").as("nb"))
        .agg(count(lit(1)).as("common"))
        .select(
          col("doc_a"), col("doc_b"),
          round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.25)
        .orderBy("doc_a", "doc_b")
    },
    None)

  val all: Seq[Q] = Seq(minhashLsh, simhash, ngramJaccard)
}
