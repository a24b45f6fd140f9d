package graft.queries

import org.apache.spark.sql.functions._
import Tables.t

/** Bounded-state sketch queries — the mergeable-summary family beside
  * `q_agg_approx_distinct`/`q_agg_hll_merge`: heavy hitters without shuffling
  * the key distribution, and count-min point estimates with a mirrored
  * integer-exact oracle.
  */
object SketchQueries {

  /** Exact heavy hitters through a bounded-state sketch: per-partition
    * Misra-Gries (k=128 counters) → union of candidate keys (≤ partitions×k,
    * broadcast) → exact recount restricted to candidates → threshold
    * freq > n/k. The recount-then-threshold output EQUALS the plain
    * groupBy-HAVING answer (candidate union is a superset of true frequent
    * items — averaging argument, pinned in SketchesSpec), so the oracle is
    * ordinary SQL. At 100 TB the win is what never happens: no shuffle of the
    * full key distribution — the only wide stage is the recount over
    * candidate-filtered rows, and its key cardinality is ≤ partitions×k.
    */
  // the freq > n/k threshold can go EMPTY at a given SF -> AQE collapses
  // the executed plan to an EmptyRelation, zeroing the plan fingerprint;
  // the self-proxy re-fingerprints with empty-propagation excluded
  private val heavyHittersFn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val cands = ev.select(col("user_id")).as[Long]
        .mapPartitions(it => graft.operators.Sketches.misraGries(it, 128).keysIterator)
        .toDF("user_id").distinct()
      val tot = ev.agg(count(lit(1)).as("n_tot"))
      ev.select("user_id")
        .join(broadcast(cands), Seq("user_id"), "leftsemi")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .filter(col("n") * 128 > col("n_tot"))
        .select(col("user_id"), col("n"), expr("n * 10000 div n_tot").as("freq_bp"))
        .orderBy("user_id")
    }
  private val heavyHitters = Q(
    "q_agg_heavy_hitters",
    heavyHittersFn,
    Some("""WITH tot AS (SELECT count(*) AS n_tot FROM events)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             count(*) * 10000 // n_tot AS freq_bp
      FROM events, tot GROUP BY user_id, n_tot
      HAVING count(*) * 128 > n_tot ORDER BY user_id"""),
    planProxy = Some(heavyHittersFn))

  /** Bigrams of the space-tokenized text, exploded (narrow). */
  private def bigrams(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "documents")
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("bg"))

  /** Count-min sketch (Cormode & Muthukrishnan 2005) point estimates, built
    * and probed end to end in integer arithmetic the DuckDB oracle replays
    * exactly: d=3 rows × w=256 columns, the three row-hashes taken as 16-bit
    * windows of ONE 46-bit polynomial state (the same independent-probe
    * device as the bloom filter — affine probes off one hash would collide
    * jointly). Cell(j,c) = Σ counts of keys mapping there; estimate =
    * min over rows — ≥ exact by construction, the overestimate column shows
    * each probe's collision cost at this fill (916 bigrams / 256 columns).
    * Scale shape: the sketch is 768 summed cells regardless of corpus size —
    * the mergeable fixed-size state a streaming or partitioned counter needs;
    * probes meet it through a broadcast equi-join on (row, column).
    */
  private val countMin = Q(
    "q_agg_countmin",
    (s, d) => {
      val withHash = bigrams(s, d)
        .groupBy("bg").agg(count(lit(1)).as("n"))
        .withColumn("h", graft.functions.VectorFunctions.polyHash(col("bg")))
        .cache() // cells + probes both fold off this vocabulary-sized table;
                 // without the cache each recomputes the corpus bigram count
      val rc = array(
        struct(lit(0).as("j"), expr("h % 65536 % 256").as("c")),
        struct(lit(1).as("j"), expr("(h div 32768) % 65536 % 256").as("c")),
        struct(lit(2).as("j"), expr("(h div 1073741824) % 65536 % 256").as("c")))
      val cells = withHash
        .select(col("n"), explode(rc).as("rc"))
        .groupBy(col("rc.j").as("j"), col("rc.c").as("c"))
        .agg(sum("n").as("cell"))
      withHash.filter(col("n") >= 40)
        .select(col("bg"), col("n"), explode(rc).as("rc"))
        .select(col("bg"), col("n"), col("rc.j").as("j"), col("rc.c").as("c"))
        .join(broadcast(cells), Seq("j", "c"))
        .groupBy("bg", "n").agg(min("cell").as("est"))
        .select(col("bg"), col("n"), col("est"),
          (col("est") - col("n")).as("overestimate"))
        .orderBy("bg")
    },
    Some("""WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
      g AS (SELECT array_to_string(toks[i + 1:i + 2], ' ') AS bg
            FROM (SELECT toks, unnest(generate_series(0, len(toks) - 2, 1)) AS i FROM d)),
      c AS (SELECT bg, count(*) AS n FROM g GROUP BY bg),
      hh AS (SELECT bg, n, list_reduce(list_prepend(7::BIGINT,
               list_transform(range(1, length(bg) + 1),
                 i -> ord(substr(bg, CAST(i AS INT), 1))::BIGINT)),
               (acc, ch) -> (acc * 131 + ch) % 70368744177664) AS h FROM c),
      cells AS (SELECT j, cc, CAST(sum(n) AS BIGINT) AS cell FROM (
          SELECT n, unnest(list_value(0, 1, 2)) AS j,
                 unnest(list_value(h % 65536 % 256, (h // 32768) % 65536 % 256,
                   (h // 1073741824) % 65536 % 256)) AS cc
          FROM hh) GROUP BY 1, 2),
      pr AS (SELECT bg, n, unnest(list_value(0, 1, 2)) AS j,
               unnest(list_value(h % 65536 % 256, (h // 32768) % 65536 % 256,
                 (h // 1073741824) % 65536 % 256)) AS cc
             FROM hh WHERE n >= 40)
      SELECT bg, CAST(n AS BIGINT) AS n, min(cell) AS est,
             min(cell) - CAST(n AS BIGINT) AS overestimate
      FROM pr JOIN cells USING (j, cc)
      GROUP BY bg, n ORDER BY bg"""))

  /** EXACT global quantiles (p50/p90/p99) in two passes with no global sort —
    * the scale path `percentile()`'s single-partition sort cannot take at
    * 100 TB. Pass 1: a histogram aggregate on 655.36-unit value buckets
    * (map-side combinable, ~160-row output at any corpus size) plus a total
    * count; the cumulative-count window and the rank→bucket bracketing run
    * on that bounded table. Pass 2: only rows of the ≤3 target buckets
    * survive a broadcast semi-ish join, and the within-bucket ranking
    * shuffles corpus/B rows. Target ranks are integer-exact
    * ceil(p·n) = (p_bp·n + 9999) div 10000 — DuckDB's quantile_disc
    * semantics, verified empirically — and the output is an actual element,
    * so the independent oracle (not a mirror!) must match bit-for-bit.
    * Prices are exact cents, so the LONG cents key orders identically to
    * the double. At larger domains the same construction nests (bucket →
    * sub-bucket) before any partition sort exceeds memory. */
  private val quantileTwoPass = Q(
    "q_agg_quantile_2pass",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val li = t(s, d, "lineitem")
        .select(col("l_extendedprice").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("vc"))
        .withColumn("bucket", expr("vc div 65536"))
      val counts = li.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      // bounded bucket table: the no-partition window is ~160 rows by design
      val wcum = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = counts
        .withColumn("cum_before", coalesce(sum("cnt").over(wcum), lit(0L)))
      val tot = li.agg(count(lit(1)).as("n"))
      val targets = Seq(("p50", 5000L), ("p90", 9000L), ("p99", 9900L))
        .toDF("pct", "p_bp")
        .crossJoin(broadcast(tot))
        .withColumn("r", expr("(p_bp * n + 9999) div 10000"))
        .join(broadcast(cum),
          col("r") > col("cum_before") && col("r") <= col("cum_before") + col("cnt"))
        .select(col("pct"), col("bucket"), (col("r") - col("cum_before")).as("off"))
      val w = Window.partitionBy("bucket", "pct").orderBy("vc")
      li.join(broadcast(targets), Seq("bucket"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") === col("off"))
        .select(col("pct"), col("x").as("value"))
        .orderBy("pct")
    },
    Some("""SELECT * FROM (
        SELECT 'p50' AS pct, quantile_disc(l_extendedprice, 0.5) AS value FROM lineitem
        UNION ALL
        SELECT 'p90', quantile_disc(l_extendedprice, 0.9) FROM lineitem
        UNION ALL
        SELECT 'p99', quantile_disc(l_extendedprice, 0.99) FROM lineitem)
      ORDER BY pct"""))

  /** Per-group top-3 through the typed bounded-buffer aggregate
    * ([[graft.functions.TopKByValue]]) instead of a window: the window
    * formulation (`q_window_topk`) shuffles every row to its group's
    * reducer and sorts; the aggregate keeps ≤k pairs per group per map
    * task and merges partials, so the exchange carries partitions ×
    * groups × k rows — ranking with count/sum economics. The oracle IS
    * the window formulation, proving the two agree row-for-row (ties
    * resolved by the shared (value DESC, id ASC) order). PlansSpec pins
    * the partial-aggregate shape (ObjectHashAggregate before and after
    * the exchange). */
  private val topkAgg = Q(
    "q_sort_topk_group",
    (s, d) => {
      val topk = udaf(graft.functions.TopKByValue(3))
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
          col("col._1").as("o_totalprice"), col("col._2").as("o_orderkey"))
        .orderBy("o_orderpriority", "rk")
    },
    Some("""SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_totalprice, o_orderkey
      FROM (
        SELECT o_orderpriority, o_totalprice, o_orderkey,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders)
      WHERE rk <= 3 ORDER BY o_orderpriority, rk"""))

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002) — the third
    * distinct-count device beside exact `countDistinct` and the HLL
    * contract rows, and the one that is fully DETERMINISTIC across
    * engines: the k smallest Knuth-hash values over distinct customers
    * double as a coordination-free uniform sample of the key population
    * (the reservoir-sampling stand-in: a pure function of the key set, so
    * any re-shard or replay converges on the same rows) and yield the
    * estimator (k−1)·2³² div h_k in pure integer math — hash-exact against
    * the oracle, no tolerance band needed. Scale shape: one distinct
    * aggregate, then TakeOrderedAndProject for the bottom-k (per-partition
    * heap + driver merge of k rows, never a global sort); the sketch is k
    * rows at any corpus size and merges as a lattice (streaming twin in
    * [[graft.operators.Sketches.updateStoredKmv]]). */
  private val kmv = Q(
    "q_agg_kmv",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 16
      val bottom = graft.operators.Sketches
        .kmvSketch(t(s, d, "orders").select("o_custkey"), k)
        // rank window runs over the already-bounded k rows
        .withColumn("rank", row_number().over(Window.orderBy("h")).cast("long"))
      val est = bottom.agg(max("h").as("hk"))
      val exact = t(s, d, "orders")
        .agg(countDistinct("o_custkey").as("exact_distinct"))
      bottom.crossJoin(broadcast(est)).crossJoin(broadcast(exact))
        .select(col("rank"), col("h"), col("sample_key"),
          expr(s"(${k - 1} * 4294967296) div hk").as("est_distinct"),
          col("exact_distinct"))
        .orderBy("rank")
    },
    Some("""WITH dh AS (
        SELECT h, min(key) AS sample_key FROM (
          SELECT DISTINCT o_custkey AS key,
                 (o_custkey % 1000003 * 2654435761) % 4294967296 AS h
          FROM orders) t GROUP BY h),
      bottom AS (
        SELECT h, sample_key,
               CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank
        FROM dh ORDER BY h LIMIT 16),
      e AS (SELECT max(h) AS hk FROM bottom),
      x AS (SELECT count(DISTINCT o_custkey) AS exact_distinct FROM orders)
      SELECT rank, h, sample_key,
             CAST(15 * 4294967296 // hk AS BIGINT) AS est_distinct,
             CAST(x.exact_distinct AS BIGINT) AS exact_distinct
      FROM bottom, e, x ORDER BY rank"""))

  val all: Seq[Q] = Seq(heavyHitters, countMin, quantileTwoPass, topkAgg, kmv)
}
