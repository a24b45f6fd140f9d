package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.t

/** Similarity search over `embeddings.embedding` (Array[Float], 64-dim).
  *
  * Brute-force cosine top-k is the verified baseline (oracle: DuckDB
  * list_cosine_similarity on DOUBLE[]); the LSH-bucketed variant is the
  * 100 TB scale path (candidates meet via an equi-join on the bucket key —
  * no cross join ever materializes the full pair space).
  *
  * All float math is widened to double and ranking keys are rounded to 6
  * decimals in BOTH engines, so IEEE noise cannot reorder the top-k.
  */
object SimilarityQueries {

  import graft.functions.VectorFunctions.{dot, l2Normalize}

  private def embeddings(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  /** Vectors L2-normalized ONCE at scan, so cosine of a candidate pair is a
    * single codegen'd dot-product kernel call (graft.functions.DotProduct)
    * instead of dot + two norms per pair — the difference between 1 and 3
    * array passes on every one of the O(n*k) or O(n^2) candidate pairs. */
  private def normalizedEmbeddings(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), l2Normalize(col("emb")).as("emb"))

  /** Brute-force cosine top-10 for 5 query vectors: broadcast the tiny query
    * side, one pass over the corpus, per-query ranking. At 1000 executors
    * this is a map-side broadcast join + a shuffle of only (5 x corpus)
    * scored rows; swap the Window for a per-partition top-k aggregator when
    * k x queries gets large. */
  private val cosineTopk = Q(
    "q_sim_cosine_topk",
    (s, d) => {
      val e = normalizedEmbeddings(s, d)
      val q = broadcast(
        e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("emb").as("qemb")))
      val scored = e.join(q, col("vec_id") =!= col("query_id"))
        .select(
          col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot(col("emb"), col("qemb")), 6).as("cos_sim"))
      val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("neighbor_id"))
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .orderBy("query_id", "rn")
    },
    Some("""SELECT query_id, neighbor_id, cos_sim, rn FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               round(list_cosine_similarity(CAST(n.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim,
               CAST(row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(n.embedding AS DOUBLE[]),
                                                       CAST(q.embedding AS DOUBLE[])), 6) DESC,
                          n.vec_id) AS BIGINT) AS rn
        FROM embeddings q, embeddings n
        WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id) sub
      WHERE rn <= 10 ORDER BY query_id, rn"""))

  /** Global top-20 most-similar pairs, brute force (oracle-checked). The
    * exact all-pairs form is intentionally bounded: it exists as the
    * correctness baseline for the LSH variant below, and at scale would be
    * replaced by it. */
  private val neardupPairs = Q(
    "q_sim_neardup_pairs",
    (s, d) => {
      val e = normalizedEmbeddings(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("emb").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("emb").as("emb_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(
          col("id_a"), col("id_b"),
          round(dot(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("id_a"), asc("id_b"))
        .limit(20)
    },
    Some("""SELECT id_a, id_b, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) sub
      ORDER BY cos_sim DESC, id_a, id_b LIMIT 20"""))

  /** Embedding-cosine near-dedup, keep-list semantics (the fifth dedup
    * family member next to exact/minhash/simhash/ngram): pairs above the
    * cosine threshold collapse to a canonical minimum-id representative,
    * one row per vector with a dup flag — linear output, joins back against
    * the corpus as a semi/anti join. The exact all-pairs candidate source is
    * the verified baseline; at corpus sizes where it stops being viable the
    * hyperplane-bucket equi-join (q_sim_lsh_ann) slots in as the candidate
    * source with the same verify + keep-list tail. Threshold 0.45 sits
    * >=1e-4 away from every pair in the synthetic data, so engine FP noise
    * cannot flip membership. */
  private val embedDedup = Q(
    "q_dedup_embed",
    (s, d) => {
      val e = normalizedEmbeddings(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("emb").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("emb").as("emb_b"))
      val pairs = a.join(b, col("id_a") < col("id_b"))
        .filter(dot(col("emb_a"), col("emb_b")) >= 0.45)
        .select("id_a", "id_b")
      val sym = pairs.union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      e.select(col("vec_id"))
        .join(sym.groupBy(col("id_a").as("vec_id")).agg(min("id_b").as("min_nb")),
          Seq("vec_id"), "left")
        .select(
          col("vec_id"),
          least(col("vec_id"), coalesce(col("min_nb"), col("vec_id"))).as("canonical_id"))
        .withColumn("is_dup", col("canonical_id") < col("vec_id"))
        .orderBy("vec_id")
    },
    Some("""WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45),
      sym AS (SELECT id_a, id_b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      nb AS (SELECT id_a AS vec_id, min(id_b) AS min_nb FROM sym GROUP BY id_a)
      SELECT e.vec_id,
        least(e.vec_id, coalesce(nb.min_nb, e.vec_id)) AS canonical_id,
        least(e.vec_id, coalesce(nb.min_nb, e.vec_id)) < e.vec_id AS is_dup
      FROM embeddings e LEFT JOIN nb ON e.vec_id = nb.vec_id
      ORDER BY e.vec_id"""))

  /** Random-hyperplane LSH ANN: 6 sign bits → 64 buckets; neighbors are
    * searched only within a query's bucket (equi-join on the bucket id).
    * Hyperplanes are seeded-deterministic. Rows-only check here; the
    * ScalaTest spec measures recall against the brute-force baseline. */
  private val lshAnn = Q(
    "q_sim_lsh_ann",
    (s, d) => {
      val rng = new scala.util.Random(42)
      val planes: Seq[Seq[Double]] =
        Seq.fill(6)(Seq.fill(64)(rng.nextGaussian()))
      val planesCol = typedlit(planes)
      def bucket(emb: Column): Column =
        aggregate(
          sequence(lit(0), lit(5)),
          lit(0L),
          (acc, i) =>
            acc + when(dot(emb, element_at(planesCol, (i + 1).cast("int"))) > 0,
              call_function("shiftleft", lit(1L), i)).otherwise(0L))
      val e = normalizedEmbeddings(s, d).withColumn("bucket", bucket(col("emb")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("bucket"))
      // broadcast the tiny query side: the corpus never shuffles on bucket
      val scored = e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(
          col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot(col("emb"), col("qemb")), 6).as("cos_sim"))
      val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("neighbor_id"))
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("query_id", "rn")
    },
    None)

  /** IVF (inverted-file) ANN — the second scale path next to hyperplane LSH:
    * a deterministic corpus sample acts as the coarse quantizer, every
    * vector is assigned to its nearest centroid cell in one broadcast-join
    * pass, and a query probes only its nprobe nearest cells (equi-join on
    * the cell id — the full corpus never meets the query). At sf0.001 the
    * probe count covers all cells, so FunctionsSpec pins exact agreement
    * with brute force; at scale nprobe/ncells is the recall/cost dial. */
  private val ivfAnn = Q(
    "q_sim_ivf_ann",
    (s, d) => {
      val e = normalizedEmbeddings(s, d).cache()
      val centroids = broadcast(
        e.filter(col("vec_id") % 61 === 0)
          .select(col("vec_id").as("cent_id"), col("emb").as("cemb")))
      val wAssign = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cent_id"))
      val assigned = e.crossJoin(centroids)
        .select(col("vec_id"), col("emb"), col("cent_id"),
          dot(col("emb"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("emb"), col("cent_id").as("cell"))
      val wProbe = Window.partitionBy("query_id").orderBy(desc("csim"), asc("cent_id"))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
        .crossJoin(centroids)
        .select(col("query_id"), col("qemb"), col("cent_id"),
          dot(col("qemb"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 4) // nprobe
        .select(col("query_id"), col("qemb"), col("cent_id").as("cell"))
      val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("neighbor_id"))
      assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot(col("emb"), col("qemb")), 6).as("cos_sim"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("query_id", "rn")
    },
    None)

  /** Multimodal plumbing: an opaque binary media column (stubbed here as the
    * utf-8 bytes of `text` — no image libs in this container) with typed
    * metadata extraction. The Spark-side shape (binary column, per-row
    * metadata, deterministic feature hash) is real and oracle-checked on
    * byte length. */
  private val multimodalMeta = Q(
    "q_multimodal_meta",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("media"))
        .select(
          col("doc_id"),
          length(col("media")).cast("long").as("media_len"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS media_len
      FROM documents ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(cosineTopk, neardupPairs, embedDedup, lshAnn, ivfAnn, multimodalMeta)
}
