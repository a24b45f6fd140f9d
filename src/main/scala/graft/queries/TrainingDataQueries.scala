package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.t

/** Training-corpus preparation surface beyond cleaning/dedup: context-window
  * chunking, train/eval decontamination, and deterministic weighted
  * sampling. All three are shuffle-minimal shapes that survive 100 TB:
  * chunking is a narrow per-row explode (no shuffle at all); decontamination
  * meets through an n-gram equi-join (the industry-standard shape — the
  * candidate key IS the n-gram, never a pair enumeration); sampling is a
  * stateless integer-hash filter (reshuffle-stable, no RNG state, no
  * coordination).
  */
object TrainingDataQueries {

  /** Sliding token-window chunking (64-token windows, stride 48): the
    * context-window split every LLM training pipeline applies before
    * tokenization. Pure narrow transform — split + sequence + explode stay
    * inside whole-stage codegen; at 100 TB this is scan-bound with zero
    * exchanges. Every start in range(0, n_tokens, stride) emits a chunk;
    * the final chunk may be short (standard sliding-window semantics). */
  private val chunk = Q(
    "q_text_chunk",
    (s, d) => {
      val size64 = 64
      val stride = 48
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", org.apache.spark.sql.functions.size(col("toks")).cast("long"))
        .select(
          col("doc_id"),
          col("toks"),
          col("n"),
          posexplode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)), lit(stride.toLong))))
        .select(
          col("doc_id"),
          col("pos").cast("long").as("chunk_idx"),
          col("col").as("start"),
          least(lit(size64.toLong), col("n") - col("col")).as("n_tokens"),
          array_join(slice(col("toks"), (col("col") + 1).cast("int"), lit(size64)), " ")
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           s AS (SELECT doc_id, toks, len(toks) AS n FROM d),
           e AS (SELECT doc_id, toks, n,
                   unnest(generate_series(0, greatest(n - 1, 0), 48)) AS start FROM s)
      SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx, CAST(start AS BIGINT) AS start,
             CAST(least(64, n - start) AS BIGINT) AS n_tokens,
             array_to_string(toks[start + 1:start + 64], ' ') AS chunk_text
      FROM e ORDER BY doc_id, chunk_idx"""))

  /** Train/eval decontamination: eval docs sharing any word 4-gram with the
    * training split (same deterministic id-keyed split as q_train_split).
    * The scale shape is the point — (doc, ngram) pairs are deduped BEFORE
    * the join, candidates meet through the n-gram equi-join key, and the
    * output is per-doc counts, never pair listings. At 100 TB the join key
    * would be xxhash64(ngram) (8 bytes instead of the string; same plan) and
    * n would be 8-13; n=4 here because the synthetic corpus's word-shuffle
    * near-dups destroy longer n-grams. hit_bp is basis points as pure
    * integer math — identical across engines by construction. */
  private val contamination = Q(
    "q_contamination",
    (s, d) => {
      val n = 4
      val docs = t(s, d, "documents")
        .select(
          col("doc_id"),
          when(col("doc_id") % 10 < 9, "train").otherwise("eval").as("split"),
          split(col("text"), " ").as("toks"))
        .filter(org.apache.spark.sql.functions.size(col("toks")) >= n)
      val grams = docs.select(
        col("doc_id"),
        col("split"),
        // codegen'd n-gram kernel (r19): the transform/array_join/slice
        // HOF chain evaluated an interpreted lambda per gram
        explode(graft.functions.VectorFunctions.wordNgrams(col("toks"), n)).as("ng"))
      val trainG = grams.filter(col("split") === "train").select("ng").distinct()
      val evalG = grams.filter(col("split") === "eval").select("doc_id", "ng").distinct()
      val totals = evalG.groupBy("doc_id").agg(count(lit(1)).as("n_ngrams"))
      val hits = evalG.join(trainG, "ng").groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      totals
        .join(hits, "doc_id")
        .withColumn("hit_bp", expr("(n_hit * 10000) div n_ngrams"))
        .select("doc_id", "n_ngrams", "n_hit", "hit_bp")
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
               CASE WHEN doc_id % 10 < 9 THEN 'train' ELSE 'eval' END AS split,
               string_split(text, ' ') AS toks FROM documents),
           g AS (SELECT doc_id, split, array_to_string(toks[i + 1:i + 4], ' ') AS ng
                 FROM (SELECT doc_id, split, toks,
                         unnest(generate_series(0, len(toks) - 4, 1)) AS i
                       FROM d WHERE len(toks) >= 4)),
           tg AS (SELECT DISTINCT ng FROM g WHERE split = 'train'),
           eg AS (SELECT DISTINCT doc_id, ng FROM g WHERE split = 'eval'),
           tot AS (SELECT doc_id, count(*) AS n_ngrams FROM eg GROUP BY doc_id),
           hit AS (SELECT e.doc_id, count(*) AS n_hit FROM eg e JOIN tg ON e.ng = tg.ng
                   GROUP BY e.doc_id)
      SELECT t.doc_id, t.n_ngrams, h.n_hit, (h.n_hit * 10000) // t.n_ngrams AS hit_bp
      FROM tot t JOIN hit h ON t.doc_id = h.doc_id
      ORDER BY t.doc_id"""))

  /** Deterministic weight-proportional Bernoulli sampling: keep a doc with
    * probability min(n_chars/10, 500)/1000, decided by a multiplicative
    * integer hash of the id — no RNG state, so the sample is identical
    * across reshuffles, retries and re-runs (the reproducibility property a
    * training pipeline needs), and pure integer math means the oracle is
    * exact. Stateless narrow filter: at 100 TB it rides the scan, with the
    * filter pushed to parquet. Production would hash content (xxhash64)
    * rather than the id; the operator shape is identical. */
  private val sampleWeighted = Q(
    "q_sample_weighted",
    (s, d) =>
      t(s, d, "documents")
        .withColumn("weight", least(expr("n_chars div 10"), lit(500L)))
        .filter((col("doc_id") % 1000003L * 2654435761L % 4294967296L) % 1000L < col("weight"))
        .select("doc_id", "lang", "n_chars", "weight")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, n_chars, least(n_chars // 10, 500) AS weight
      FROM documents
      WHERE ((doc_id % 1000003) * 2654435761) % 4294967296 % 1000 < least(n_chars // 10, 500)
      ORDER BY doc_id"""))

  /** floor(3·log2 x) in pure integer ops, overflow-safe at ANY count.
    * Below 2^20 it is the exact x³ bit-length device (x³ < 2^60). At or
    * above 2^20 the cube would overflow a 64-bit long — the r13 full-gate
    * run at 10x sf0.1 caught exactly that (ANSI ARITHMETIC_OVERFLOW on the
    * corpus totals; the class of bug only data growth surfaces) — so the
    * argument is first truncated to its top 20 bits: for x = t·2^e + r
    * with t ∈ [2^19, 2^20), floor(3·log2(t·2^e)) = 3e + bitlen(t³) − 1.
    * Truncation perturbs the log by < 3/(t·ln2) < 2^-17 — below third-bit
    * resolution except within 2^-17 of a boundary — and both engines
    * apply the IDENTICAL truncation, so the compare stays bit-exact at
    * every scale. */
  private def sqlLg3(e: String): String = {
    val x = s"CAST(($e) AS BIGINT)"
    val t = s"($x >> (length(bin($x)) - 20))"
    s"""(CASE WHEN $x < 1048576 THEN length(bin($x*$x*$x)) - 1
         ELSE 3*(length(bin($x)) - 20) + length(bin($t*$t*$t)) - 1 END)"""
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al., 2023),
    * the hashed-n-gram importance-weighting selector used to pick
    * target-distribution-like documents out of a web crawl: features are
    * word unigrams + bigrams hashed into B=64 buckets (feature hashing —
    * the same polyHash46 kernel as the NB classifier and topic vectorizer),
    * the importance weight of bucket b is log p_target(b) − log p_raw(b),
    * and a document's score is Σ_b n_b(doc)·λ_b plus the normalization
    * constant n_feats·(log R − log T). Selection keeps score > 0 (importance
    * weight > 1 — "more target-like than raw"); the paper's Gumbel-top-k
    * resample adds RNG on top of the same score, deliberately left
    * deterministic here (the reproducibility-under-retry property every
    * other sampler in this file pins). Logs are integer third-bit
    * resolution via the overflow-safe widened device (see [[sqlLg3]]):
    * the original bitlen(x³)−1 form overflowed on the corpus totals the
    * moment the r13 full gate ran at 10x sf0.1 — ~2M features per class
    * was its documented boundary and real data crossed it — so counts
    * ≥ 2^20 now truncate to their top 20 bits before cubing, identical
    * formula on both engines, valid at any corpus size. Scale shape: one
    * (doc, bucket)
    * count shuffle (the tf-idf shape); the λ table is B rows → broadcast;
    * the two totals are one broadcast row. No pairwise stage anywhere; at
    * 100 TB B rises (DSIR uses 10k buckets) and stays broadcastable. */
  private val sampleDsir = Q(
    "q_sample_dsir",
    (s, d) => {
      // mirror of sqlLg3 (see its scaladoc): exact x³ device below 2^20,
      // top-20-bit truncated device above — overflow-safe at any scale
      val lg3 = (c: Column) => {
        val t = call_function("shiftright", c, length(bin(c)) - lit(20))
        when(c < 1048576L, length(bin(c * c * c)) - 1)
          .otherwise((length(bin(c)) - lit(20)) * lit(3) +
            length(bin(t * t * t)) - lit(1))
          .cast("long")
      }
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          col("source").isin("src0", "src1", "src2").as("is_target"),
          split(col("text"), " ").as("ws"))
      val feats = docs
        .select(col("doc_id"), col("is_target"),
          explode(concat(col("ws"),
            when(size(col("ws")) >= 2, expr(
              "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"))
              .otherwise(expr("CAST(array() AS array<string>)")))).as("f"))
        .select(col("doc_id"), col("is_target"),
          (graft.functions.VectorFunctions.polyHash(col("f")) % 64L).as("b"))
      val lam = feats.groupBy("b").agg(
          sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
          sum(when(col("is_target"), 0L).otherwise(1L)).as("cr"))
        .select(col("b"), (lg3(col("ct") + 1) - lg3(col("cr") + 1)).as("lam"))
      val tot = feats.agg(
        lg3(sum(when(col("is_target"), 0L).otherwise(1L))).as("lg_r"),
        lg3(sum(when(col("is_target"), 1L).otherwise(0L))).as("lg_t"))
      feats.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
        .join(broadcast(lam), Seq("b"))
        .groupBy("doc_id")
        .agg(sum("n").as("n_feats"),
          sum(col("n") * col("lam")).as("s0"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_feats"),
          (col("s0") + col("n_feats") * (col("lg_r") - col("lg_t"))).as("score_tb"))
        .withColumn("selected", col("score_tb") > 0)
        .orderBy("doc_id")
    },
    Some(s"""WITH docs AS (SELECT doc_id, source IN ('src0','src1','src2') AS is_target,
              string_split(text, ' ') AS ws FROM documents),
      fu AS (SELECT doc_id, is_target, unnest(ws) AS f FROM docs),
      fb AS (SELECT doc_id, is_target, ws[i] || ' ' || ws[i+1] AS f
             FROM docs, LATERAL unnest(range(1, len(ws))) t(i) WHERE len(ws) >= 2),
      fh AS (SELECT doc_id, is_target,
               list_reduce(list_prepend(7::BIGINT,
                   list_transform(range(1, length(f) + 1),
                     i -> ord(substr(f, CAST(i AS INT), 1))::BIGINT)),
                 (acc, c) -> (acc * 131 + c) % 70368744177664) % 64 AS b
             FROM (SELECT * FROM fu UNION ALL SELECT * FROM fb)),
      lam AS (SELECT b,
                ${sqlLg3("sum(CASE WHEN is_target THEN 1 ELSE 0 END) + 1")}
                - ${sqlLg3("sum(CASE WHEN is_target THEN 0 ELSE 1 END) + 1")} AS lam
              FROM fh GROUP BY b),
      tot AS (SELECT ${sqlLg3("sum(CASE WHEN is_target THEN 0 ELSE 1 END)")} AS lg_r,
                ${sqlLg3("sum(CASE WHEN is_target THEN 1 ELSE 0 END)")} AS lg_t
              FROM fh),
      db AS (SELECT doc_id, b, count(*) AS n FROM fh GROUP BY doc_id, b)
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
             CAST(sum(n * lam) + sum(n) * (lg_r - lg_t) AS BIGINT) AS score_tb,
             (sum(n * lam) + sum(n) * (lg_r - lg_t)) > 0 AS selected
      FROM db JOIN lam USING (b), tot
      GROUP BY doc_id, lg_r, lg_t ORDER BY doc_id"""))

  /** Context-window sequence packing (the "concatenate-and-split" layout
    * every pretraining run uses): documents are laid end to end in a
    * deterministic order and the token stream is cut every 1024 tokens;
    * each doc reports its pack id and whether it straddles a cut. Packing
    * is PER LANGUAGE — the window partitions by `lang`, so the prefix sum
    * parallelizes across language shards instead of forcing a global
    * single-partition ordering (at 100 TB the partition key would be the
    * output shard: lang x date x bucket — same shape, more keys). Pure
    * integer math end to end, so the oracle is exact. */
  private val packSequences = Q(
    "q_pack_sequences",
    (s, d) => {
      val ctx = 1024L
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "documents")
        .select(
          col("doc_id"), col("lang"),
          org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n_toks"))
        .withColumn("cum", sum("n_toks").over(w))
        .withColumn("start", col("cum") - col("n_toks"))
        .withColumn("pack_id", expr(s"start div $ctx"))
        .withColumn("crosses", expr(s"start div $ctx") =!= expr(s"(cum - 1) div $ctx"))
        .select("doc_id", "lang", "n_toks", "start", "pack_id", "crosses")
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks FROM documents),
           c AS (SELECT doc_id, lang, n_toks,
                   sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM d)
      SELECT doc_id, lang, n_toks,
             CAST(cum - n_toks AS BIGINT) AS start,
             CAST((cum - n_toks) // 1024 AS BIGINT) AS pack_id,
             (cum - n_toks) // 1024 <> (cum - 1) // 1024 AS crosses
      FROM c ORDER BY doc_id"""))

  /** Deterministic global training-order shuffle: every epoch of every
    * pretraining run reads the corpus in a pseudo-random order that must be
    * REPRODUCIBLE (resume mid-epoch, re-run byte-identically) — so the
    * order is a multiplicative integer hash of the id, not an RNG. The
    * scale shape: the hash also assigns the output SHARD (bucket = h % 32),
    * and the position is a row_number within the shard — a parallel window
    * over 32 independent partitions, never a global single-partition sort.
    * At 100 TB the writer sorts-within-partitions per bucket and each shard
    * file is internally ordered; readers stream shards round-robin. Pure
    * integer math, so the DuckDB oracle replays it exactly. */
  private val shuffleOrder = Q(
    "q_shuffle_order",
    (s, d) => {
      val w = Window.partitionBy("bucket").orderBy(asc("h"), asc("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), (col("doc_id") % 1000003L * 2654435761L % 4294967296L).as("h"))
        .withColumn("bucket", col("h") % 32L)
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("doc_id", "bucket", "pos")
        .orderBy("bucket", "pos")
    },
    Some("""WITH d AS (SELECT doc_id, ((doc_id % 1000003) * 2654435761) % 4294967296 AS h FROM documents)
      SELECT doc_id, h % 32 AS bucket,
             CAST(row_number() OVER (PARTITION BY h % 32 ORDER BY h, doc_id) AS BIGINT) AS pos
      FROM d ORDER BY bucket, pos"""))

  /** Source mixing — the ratio dial of every pretraining data recipe, in
    * both directions at once: per-source DOWN-sampling (keep-rate in
    * permille, decided by the same stateless multiplicative id-hash as
    * q_sample_weighted) and per-source UP-sampling (integer epoch repeats,
    * emitted as (doc, epoch) rows by a narrow sequence-explode). Here the
    * "source" is the language column; production keys the rates off a
    * source/domain tag the same way. Both stages are narrow (filter +
    * generate_series explode riding the scan); the mixed stream then feeds
    * q_shuffle_order for the final order. Integer math end to end. */
  private val mixSources = Q(
    "q_mix_sources",
    (s, d) => {
      val rate = expr(
        "CASE lang WHEN 'en' THEN 700 WHEN 'de' THEN 1000 WHEN 'fr' THEN 1000 ELSE 1000 END")
      val repeats = expr(
        "CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 1 ELSE 2 END")
      t(s, d, "documents")
        .filter((col("doc_id") % 1000003L * 2654435761L % 4294967296L) % 1000L < rate)
        .select(col("doc_id"), col("lang"), explode(sequence(lit(1), repeats)).as("epoch"))
        .select(col("doc_id"), col("lang"), col("epoch").cast("long").as("epoch"))
        .orderBy("doc_id", "epoch")
    },
    Some("""SELECT doc_id, lang, CAST(unnest(generate_series(1,
               CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 1 ELSE 2 END)) AS BIGINT) AS epoch
      FROM documents
      WHERE ((doc_id % 1000003) * 2654435761) % 4294967296 % 1000 <
            CASE lang WHEN 'en' THEN 700 WHEN 'de' THEN 1000 WHEN 'fr' THEN 1000 ELSE 1000 END
      ORDER BY doc_id, epoch"""))

  /** Bloom-filter decontamination — the broadcast-scale twin of
    * `q_contamination`, in the production direction: scrub the 100 TB
    * TRAIN corpus of benchmark (eval) n-grams. The n-gram equi-join shape
    * shuffles every corpus n-gram; here the benchmark side is folded into
    * an m=65536-bit Bloom filter (k=3 probes sliced as three 16-bit
    * windows of ONE 46-bit polynomial hash state — every step integer,
    * both engines replay it exactly; affine probes h*A_j+B_j off one
    * narrow hash are a documented trap: a single position collision
    * implies all k collide, degenerating the filter to k=1 — measured
    * 3.6% FP before the window fix, ~0.1% after, the independent-probe
    * rate),
    * stored as 2048 x 32-bit words and BROADCAST, so the corpus side is a
    * narrow scan + 3 bit-probes; only the flagged superset (no false
    * negatives by construction; false positives at the documented
    * ~(fill)^3 rate) meets the real benchmark set in an exact confirming
    * join. Per train doc: distinct n-grams, bloom-flagged count, exact
    * count, and the false-positive overhead the filter paid. Sizing rule
    * in the docstring is the operator's dial: m ~ 16-32 bits per expected
    * key keeps the confirm join ~1e-3 of the corpus; at 100 TB m grows to
    * a few hundred MB and stays a broadcast. 32-bit words inside BIGINTs
    * keep every shift/or ANSI-overflow-free (the established sign-bit
    * packing device). */
  private val contaminationBloom = Q(
    "q_contamination_bloom",
    (s, d) => {
      import graft.operators.Decontamination
      val docs = t(s, d, "documents")
      // shared verbatim with operators.Decontamination (the stored-filter
      // lifecycle + streaming scrub): n-gram extraction, the 46-bit
      // windowed hash, the one-broadcast-map-row probe — the in-query path
      // trains the filter inline so the oracle replays the whole pipeline
      val evalG = Decontamination
        .docNgrams(docs.filter(col("doc_id") % 10 >= 9)).select("ng").distinct()
      val trainG = Decontamination.docNgrams(docs.filter(col("doc_id") % 10 < 9))
      val perNg = Decontamination.probe(
        trainG, Decontamination.bloomRow(Decontamination.bloomTable(evalG)))
      val exact = perNg.filter(col("bloom_hit"))
        .join(evalG, Seq("ng"), "leftsemi")
        .groupBy("doc_id").agg(count(lit(1)).as("exact_hits"))
      trainG.groupBy("doc_id").agg(count(lit(1)).as("n_ngrams"))
        .join(perNg.filter(col("bloom_hit")).groupBy("doc_id")
          .agg(count(lit(1)).as("bloom_hits")), Seq("doc_id"), "left")
        .join(exact, Seq("doc_id"), "left")
        // coalesce each hit column in its OWN projection: re-aliasing
        // bloom_hits/exact_hits in the same select whose fp_hits /
        // is_contaminated siblings reference them would self-shadow
        // referenced input names (EngineSpec lint)
        .withColumn("bloom_hits", coalesce(col("bloom_hits"), lit(0L)))
        .withColumn("exact_hits", coalesce(col("exact_hits"), lit(0L)))
        .select(
          col("doc_id"),
          col("n_ngrams"),
          col("bloom_hits"),
          col("exact_hits"),
          (col("bloom_hits") - col("exact_hits")).as("fp_hits"),
          (col("exact_hits") > 0).as("is_contaminated"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
               CASE WHEN doc_id % 10 < 9 THEN 'train' ELSE 'eval' END AS split,
               string_split(text, ' ') AS toks FROM documents),
           g AS (SELECT doc_id, split, array_to_string(toks[i + 1:i + 4], ' ') AS ng
                 FROM (SELECT doc_id, split, toks,
                         unnest(generate_series(0, len(toks) - 4, 1)) AS i
                       FROM d WHERE len(toks) >= 4)),
           eg AS (SELECT DISTINCT ng FROM g WHERE split = 'eval'),
           tg AS (SELECT DISTINCT doc_id, ng FROM g WHERE split = 'train'),
           eh AS (SELECT list_reduce(list_prepend(7::BIGINT,
                      list_transform(range(1, length(ng) + 1),
                        i -> ord(substr(ng, CAST(i AS INT), 1))::BIGINT)),
                    (acc, c) -> (acc * 131 + c) % 70368744177664) AS h
                  FROM eg),
           bl AS (SELECT p // 32 AS word_idx,
                    bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
                  FROM (SELECT unnest(list_value(h % 65536,
                          (h // 32768) % 65536, (h // 1073741824) % 65536)) AS p FROM eh)
                  GROUP BY 1),
           th AS (SELECT doc_id, ng, list_reduce(list_prepend(7::BIGINT,
                      list_transform(range(1, length(ng) + 1),
                        i -> ord(substr(ng, CAST(i AS INT), 1))::BIGINT)),
                    (acc, c) -> (acc * 131 + c) % 70368744177664) AS h
                  FROM tg),
           pr AS (SELECT doc_id, ng, unnest(list_value(h % 65536,
                    (h // 32768) % 65536, (h // 1073741824) % 65536)) AS p
                  FROM th),
           pb AS (SELECT doc_id, ng,
                    bool_and((coalesce(bits, 0) & (1::BIGINT << CAST(p % 32 AS INT))) <> 0)
                      AS bloom_hit
                  FROM pr LEFT JOIN bl ON pr.p // 32 = bl.word_idx
                  GROUP BY doc_id, ng),
           bh AS (SELECT doc_id, count(*) AS bloom_hits FROM pb WHERE bloom_hit
                  GROUP BY doc_id),
           ex AS (SELECT doc_id, count(*) AS exact_hits
                  FROM pb JOIN eg USING (ng) WHERE bloom_hit GROUP BY doc_id),
           tot AS (SELECT doc_id, count(*) AS n_ngrams FROM tg GROUP BY doc_id)
      SELECT tot.doc_id, tot.n_ngrams,
             coalesce(bh.bloom_hits, 0) AS bloom_hits,
             coalesce(ex.exact_hits, 0) AS exact_hits,
             coalesce(bh.bloom_hits, 0) - coalesce(ex.exact_hits, 0) AS fp_hits,
             coalesce(ex.exact_hits, 0) > 0 AS is_contaminated
      FROM tot LEFT JOIN bh ON tot.doc_id = bh.doc_id
               LEFT JOIN ex ON tot.doc_id = ex.doc_id
      ORDER BY tot.doc_id"""))

  /** Dataset card — the datasheet every corpus release ships (Gebru et al.
    * 2021, "Datasheets for Datasets"): per-(source, language) doc/token/
    * char counts, corpus share, and exact-dup rate, with source-level and
    * corpus-level rollups in the SAME pass via GROUPING SETS (one Expand,
    * not three scans — at 100 TB the difference between a datasheet job
    * and three). Dup accounting reuses the keep-first exact-dedup rule
    * (min doc_id per identical text). Integer basis points throughout, so
    * the oracle is exact. Rollup rows are labeled via `grouping()` (not a
    * `coalesce` sentinel, which would be ambiguous if a source were ever
    * literally 'ALL' or NULL), the grouping level is emitted as `gid` and
    * closes the ORDER BY, so row identity and order are total across
    * grouping sets in any engine. */
  private val datasetCard = Q(
    "q_train_dataset_card",
    (s, d) => {
      Tables.views(s, d, "documents")
      s.sql("""WITH dup AS (
          SELECT doc_id, source, lang, n_chars,
                 size(split(text, ' ')) AS n_toks,
                 min(doc_id) OVER (PARTITION BY text) < doc_id AS is_dup
          FROM documents),
        tot AS (SELECT count(*) AS total_docs FROM documents)
        SELECT CASE WHEN grouping(source) = 1 THEN 'ALL' ELSE source END AS src,
               CASE WHEN grouping(lang) = 1 THEN 'ALL' ELSE lang END AS lng,
               CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid,
               count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(*) * 10000 div max(total_docs) AS BIGINT) AS share_bp,
               CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
               CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 10000 div count(*) AS BIGINT) AS dup_bp
        FROM dup, tot
        GROUP BY GROUPING SETS ((source, lang), (source), ())
        ORDER BY src, lng, gid""")
    },
    Some("""WITH dup AS (
        SELECT doc_id, source, lang, n_chars,
               len(string_split(text, ' ')) AS n_toks,
               min(doc_id) OVER (PARTITION BY text) < doc_id AS is_dup
        FROM documents),
      tot AS (SELECT count(*) AS total_docs FROM documents)
      SELECT CASE WHEN grouping(source) = 1 THEN 'ALL' ELSE source END AS src,
             CASE WHEN grouping(lang) = 1 THEN 'ALL' ELSE lang END AS lng,
             CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid,
             count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(count(*) * 10000 // max(total_docs) AS BIGINT) AS share_bp,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS dup_bp
      FROM dup, tot
      GROUP BY GROUPING SETS ((source, lang), (source), ())
      ORDER BY src, lng, gid"""))

  /** Length-bucketed packing accounting — the alternative to
    * `q_pack_sequences`' concatenate-and-split: group documents into
    * power-of-two length buckets (bucket = 2^ceil(lg len), the
    * floor-log2-as-binary-length device on len-1), reserve bucket-width
    * slots, floor(1024/bucket) docs per context — no document ever
    * straddles a context boundary (the property attention masking wants),
    * at the cost of explicit padding. The output quantifies that cost per
    * (lang, bucket): contexts needed and padding waste in basis points —
    * the accounting a pipeline runs to choose between the two layouts.
    * Pure integer math; one (lang, bucket) count shuffle. */
  private val packBuckets = Q(
    "q_pack_buckets",
    (s, d) => {
      val ctx = 1024L
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          least(org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long"),
            lit(ctx)).as("n_toks"))
        .withColumn("bucket",
          when(col("n_toks") <= 1L, 1L)
            .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n_toks - 1)) AS INT))")))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_toks"))
        .withColumn("docs_per_ctx", expr(s"$ctx div bucket"))
        .withColumn("n_contexts",
          expr("(n_docs + docs_per_ctx - 1) div docs_per_ctx"))
        .withColumn("waste_bp",
          expr(s"(n_contexts * $ctx - sum_toks) * 10000 div (n_contexts * $ctx)"))
        .select("lang", "bucket", "n_docs", "sum_toks", "n_contexts", "waste_bp")
        .orderBy("lang", "bucket")
    },
    Some("""WITH d AS (SELECT doc_id, lang,
               least(CAST(len(string_split(text, ' ')) AS BIGINT), 1024) AS n_toks
             FROM documents),
      b AS (SELECT lang,
              CASE WHEN n_toks <= 1 THEN 1
                   ELSE (1::BIGINT << CAST(length(bin(n_toks - 1)) AS INT)) END AS bucket,
              n_toks
            FROM d),
      g AS (SELECT lang, bucket, count(*) AS n_docs,
              CAST(sum(n_toks) AS BIGINT) AS sum_toks
            FROM b GROUP BY lang, bucket),
      c AS (SELECT lang, bucket, n_docs, sum_toks,
              1024 // bucket AS docs_per_ctx,
              (n_docs + (1024 // bucket) - 1) // (1024 // bucket) AS n_contexts
            FROM g)
      SELECT lang, bucket, n_docs, sum_toks, n_contexts,
             (n_contexts * 1024 - sum_toks) * 10000 // (n_contexts * 1024) AS waste_bp
      FROM c ORDER BY lang, bucket"""))

  /** Balanced shard assignment + skew report — the layout step before a
    * 100 TB corpus is written as N fixed output shards: stateless
    * multiplicative-hash shard ids (reshuffle-stable, no RNG — the
    * `q_sample_weighted` device), per-shard doc/token tallies, and each
    * shard's token load in basis points of the perfectly-balanced mean —
    * the number an operator alarms on before hot shards slow every
    * downstream consumer. One 64-key count shuffle; integer-exact. */
  private val shards = Q(
    "q_train_shards",
    (s, d) => {
      val n = 64L
      val tallied = t(s, d, "documents")
        .select(
          expr("(doc_id % 1000003 * 2654435761 % 4294967296) % 64").as("shard"),
          org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long")
            .as("n_toks"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
      val tot = tallied.agg(sum("n_tokens").as("total_tokens"))
      tallied.crossJoin(broadcast(tot))
        .withColumn("load_bp", expr(s"n_tokens * $n * 10000 div total_tokens"))
        .select("shard", "n_docs", "n_tokens", "load_bp")
        .orderBy("shard")
    },
    Some("""WITH d AS (SELECT (doc_id % 1000003 * 2654435761 % 4294967296) % 64 AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
             FROM documents),
      g AS (SELECT shard, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens
            FROM d GROUP BY shard),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM g)
      SELECT shard, n_docs, n_tokens,
             n_tokens * 64 * 10000 // total_tokens AS load_bp
      FROM g, tot ORDER BY shard"""))

  /** Temperature-scaled multilingual rebalancing (the τ-sampling of every
    * multilingual pretraining recipe, τ = 0.5): language l keeps documents
    * at rate ∝ 1/√n_l, normalized so the SMALLEST language keeps everything
    * — sampled mass per language goes as √n_l, flattening the head without
    * starving the tail (en 218→119 here while fr 64→64). Arithmetic is
    * floor(√(10⁶·n_min div n_l)) — isqrt of an integer: IEEE sqrt is
    * correctly rounded and an integer's true root is never within half an
    * ulp of a wrong integer below 2⁵², so floor agrees bit-for-bit across
    * engines with no float-boundary hazard. Selection reuses the stateless
    * multiplicative id-hash (reshuffle-stable, RNG-free). One 5-row rate
    * table broadcast onto the scan — narrow at any corpus size. */
  private val mixTemperature = Q(
    "q_mix_temperature",
    (s, d) => {
      val docs = t(s, d, "documents")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val rates = counts.crossJoin(broadcast(counts.agg(min("n").as("n_min"))))
        .select(col("lang"),
          floor(sqrt(expr("CAST(1000000 * n_min div n AS DOUBLE)")))
            .cast("long").as("keep_permille"))
      docs.join(broadcast(rates), Seq("lang"))
        .filter((col("doc_id") % 1000003L * 2654435761L % 4294967296L) % 1000L
          < col("keep_permille"))
        .select(col("doc_id"), col("lang"), col("keep_permille"))
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      mn AS (SELECT min(n) AS n_min FROM c),
      rates AS (SELECT lang,
                  CAST(floor(sqrt(CAST(1000000 * n_min // n AS DOUBLE))) AS BIGINT)
                    AS keep_permille
                FROM c, mn)
      SELECT d.doc_id, d.lang, keep_permille
      FROM documents d JOIN rates USING (lang)
      WHERE ((d.doc_id % 1000003) * 2654435761) % 4294967296 % 1000 < keep_permille
      ORDER BY d.doc_id"""))

  /** Curriculum ordering — easy-first training order without a global
    * sort: the phase label comes from FIXED thresholds on a deterministic
    * difficulty proxy (here doc length; production plugs in any scored
    * signal — perplexity, quality — the same way), NOT from ntile/quantile
    * ranking, so assigning a doc to its phase is a narrow per-row CASE and
    * the corpus is never totally ordered. Within a phase the order is
    * decorrelated from the difficulty signal by the q_shuffle_order device:
    * the multiplicative id-hash keys 32 independent shard windows per
    * phase, so the heaviest stage is row_number over phases × 32 bounded
    * partitions. Readers stream phases in label order, shards round-robin
    * within a phase — the standard curriculum schedule, reproducible from
    * pure integer math (the oracle replays it exactly). */
  private val curriculum = Q(
    "q_train_curriculum",
    (s, d) => {
      val w = Window.partitionBy("phase", "bucket").orderBy(asc("h"), asc("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          (col("doc_id") % 1000003L * 2654435761L % 4294967296L).as("h"))
        .withColumn("phase",
          when(col("n_chars") < 150, 1L).when(col("n_chars") < 250, 2L).otherwise(3L))
        .withColumn("bucket", col("h") % 32L)
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("doc_id", "phase", "bucket", "pos")
        .orderBy("phase", "bucket", "pos")
    },
    Some("""WITH d AS (
        SELECT doc_id,
               CASE WHEN n_chars < 150 THEN 1 WHEN n_chars < 250 THEN 2 ELSE 3 END AS phase,
               ((doc_id % 1000003) * 2654435761) % 4294967296 AS h
        FROM documents)
      SELECT doc_id, CAST(phase AS BIGINT) AS phase, h % 32 AS bucket,
             CAST(row_number() OVER (PARTITION BY phase, h % 32 ORDER BY h, doc_id) AS BIGINT) AS pos
      FROM d ORDER BY phase, bucket, pos"""))

  /** Proportional-allocation STRATIFIED sampling: equalize strata by
    * sampling each language at the rate that yields ~`TargetPerStratum`
    * docs — the standard rebalancing move when a corpus is dominated by one
    * language/source and the training mix wants per-stratum parity.
    * Per-stratum rates derive from one BOUNDED aggregate (|strata| rows,
    * map-side combined) broadcast back onto the scan; membership is the
    * same stateless Knuth-hash threshold as `q_sample_weighted`, so the
    * sample is reshuffle-stable and coordination-free. At 100 TB: one scan,
    * zero corpus shuffles — the rate table stays broadcastable at any
    * corpus size because strata are operator-enumerated, never data-sized. */
  private val sampleStratified = Q(
    "q_sample_stratified",
    (s, d) => {
      val targetPerStratum = 50L
      val docs = t(s, d, "documents")
      val rates = docs.groupBy("lang").agg(count(lit(1)).as("n_s"))
        .select(col("lang"),
          least(lit(10000L), expr(s"$targetPerStratum * 10000 div n_s")).as("rate_bp"))
      docs.join(broadcast(rates), "lang")
        .filter(expr("((doc_id % 1000003) * 2654435761) % 4294967296 % 10000") < col("rate_bp"))
        .select(col("doc_id"), col("lang"), col("rate_bp"))
        .orderBy("doc_id")
    },
    Some("""WITH s AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
        r AS (SELECT lang, CAST(least(10000, 50 * 10000 // n_s) AS BIGINT) AS rate_bp FROM s)
      SELECT d.doc_id, d.lang, r.rate_bp
      FROM documents d JOIN r USING (lang)
      WHERE ((d.doc_id % 1000003) * 2654435761) % 4294967296 % 10000 < r.rate_bp
      ORDER BY d.doc_id"""))

  /** Distributed RESERVOIR sampling — exactly k per stratum, the device a
    * classical single-pass reservoir cannot distribute: rank every row by
    * a deterministic per-row hash and keep the k SMALLEST per group. Any
    * worker over any shard computes the same ranks, partial top-k folds
    * per partition before the merge (Spark plans the rn<=k filter as a
    * WindowGroupLimit — per-partition heap pushdown BELOW the exchange,
    * so the shuffle carries at most k rows per group per input partition,
    * not the corpus). Versus q_sample_stratified's rate-hash (expected-
    * size sample, zero coordination), this is the EXACT-size form — the
    * "give me exactly 10k eval docs per language" request. md5 (not
    * xxhash64) keys the rank so the DuckDB oracle replays the identical
    * sample — both engines hash the same decimal-rendered doc_id string. */
  private val sampleReservoir = Q(
    "q_sample_reservoir",
    (s, d) => {
      val k = 10
      val rankKey = md5(concat(col("doc_id").cast("string"), lit("|"), col("lang")))
      val w = Window.partitionBy("lang").orderBy(col("rk"), col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), rankKey.as("rk"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select("lang", "rn", "doc_id", "rk")
        .orderBy("lang", "rn")
    },
    Some("""SELECT lang, rn, doc_id, rk FROM (
        SELECT lang, doc_id,
          md5(CAST(doc_id AS VARCHAR) || '|' || lang) AS rk,
          CAST(row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || lang), doc_id) AS BIGINT) AS rn
        FROM documents)
      WHERE rn <= 10 ORDER BY lang, rn"""))

  /** Deterministic train/val/test THREE-way split accounting (98/1/1 —
    * b < 98 train, b < 99 val, else test; r9 shipped 96/2/2 against a
    * 98/1/1 doc, reconciled to the documented ratio this round — by
    * Knuth-hash bucket — finer-grained and better-mixed than
    * `q_train_split`'s mod-10 two-way split: doc_id % 10 correlates with
    * any id-periodic collection order, the multiplicative hash does not):
    * the split assignment is the same stateless integer-hash device as the
    * samplers — any worker, any retry, any re-shard assigns a document to
    * the same split with NO split manifest to store or coordinate. The
    * query audits the split: per (split, lang) doc counts and char mass,
    * the table a training run checks before/after materializing shards.
    * One aggregate over the scan (bounded |splits|x|langs| output). */
  private val trainSplit3 = Q(
    "q_train_split3",
    (s, d) =>
      t(s, d, "documents")
        .withColumn("b", expr("((doc_id % 1000003) * 2654435761) % 4294967296 % 100"))
        .withColumn("split",
          when(col("b") < 98, "train").when(col("b") < 99, "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("split", "lang"),
    Some("""WITH d AS (
        SELECT lang, n_chars,
               ((doc_id % 1000003) * 2654435761) % 4294967296 % 100 AS b
        FROM documents)
      SELECT CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END AS split,
             lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM d GROUP BY 1, 2 ORDER BY split, lang"""))

  val all: Seq[Q] =
    Seq(chunk, contamination, sampleWeighted, sampleDsir, packSequences, shuffleOrder,
      mixSources, contaminationBloom, datasetCard, packBuckets, shards, mixTemperature,
      curriculum, sampleStratified, trainSplit3, sampleReservoir)
}
