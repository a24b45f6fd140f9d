package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Physical-plan pins: the optimizations the 100 TB design depends on must
  * actually appear in the plans — predicate pushdown to the parquet scan,
  * partition pruning, broadcast joins for small dims, TakeOrderedAndProject
  * for global top-k, and whole-stage codegen coverage. A plan regression
  * here is a scale bug even when results stay correct. */
class PlansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String = {
    // several queries .cache() shared frames ON CONSTRUCTION (q_sim_binary's
    // normalized corpus, sq8's codes, the incremental band table); a stale
    // InMemoryRelation from an earlier test would swallow the parquet scan
    // and break every later scan-level pin (PushedFilters/ReadSchema)
    spark.catalog.clearCache()
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q_proj_filter: predicates and projection reach the parquet scan") {
    val p = plan("q_proj_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_returnflag"), "filter on l_returnflag should be pushed")
    // column pruning: the scan must not read all 16 lineitem columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"), s"unpruned scan: $readSchema")
  }

  test("q_join_inner: small dimension joins broadcast, no shuffle for nation") {
    val p = plan("q_join_inner")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_join_semi / q_join_anti: planned as semi/anti joins, not inner+dedup") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("q_sort_topk: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("q_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_agg_group: partial (map-side) aggregation before the shuffle") {
    val p = plan("q_agg_group")
    assert(p.contains("HashAggregate"), p)
    // partial agg appears below the exchange: two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_scan_partition_prune: partition filter prunes at the scan") {
    val p = plan("q_scan_partition_prune")
    assert(p.contains("PartitionFilters"), p)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("year"), s"year filter not in partition filters: $pf")
  }

  test("q_join_bucketed: co-located buckets eliminate the join shuffle") {
    val bucketed = plan("q_join_bucketed")
    assert(bucketed.contains("SortMergeJoin"), bucketed)
    assert(bucketed.contains("Bucketed: true"), bucketed)
    // unbucketed twin of the same join, same hint
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$sf/orders.parquet").hint("merge")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    def exchanges(p: String) = "Exchange".r.findAllIn(p).size
    assert(exchanges(bucketed) < exchanges(raw),
      s"bucketed=${exchanges(bucketed)} raw=${exchanges(raw)}")
  }

  test("q_join_full: full outer is sort-merge (cannot broadcast), both sides shuffled on the key") {
    val p = plan("q_join_full")
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("FullOuter"), p)
  }

  test("q_join_cross: tiny cross product broadcasts, never a shuffled cartesian") {
    val p = plan("q_join_cross")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_subquery_exists: correlated EXISTS decorrelates to a semi join") {
    assert(plan("q_subquery_exists").contains("LeftSemi"))
  }

  test("q_agg_grouping_sets: planned with Expand, single scan") {
    val p = plan("q_agg_grouping_sets")
    assert(p.contains("Expand"), p)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1, p)
  }

  test("q_agg_pivot: explicit value list keeps pivot a single-pass aggregate") {
    val p = plan("q_agg_pivot")
    // one scan (no separate distinct-values job materialized in this plan),
    // partial+final aggregate around one shuffle like any groupBy
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("near-dup/similarity candidate generation joins on keys, never cross joins") {
    // minhash: candidates meet ONLY through the (band, bh) equi-join
    val minhash = plan("q_dedup_minhash")
    assert(!minhash.contains("CartesianProduct"), minhash)
    // lsh ann: bucket equi-join with the query side broadcast
    val lsh = plan("q_sim_lsh_ann")
    assert(!lsh.contains("CartesianProduct"), lsh)
    assert(lsh.contains("BroadcastHashJoin"), lsh)
    // cosine top-k: query side broadcast, corpus streamed once
    val topk = plan("q_sim_cosine_topk")
    assert(topk.contains("BroadcastNestedLoopJoin") || topk.contains("BroadcastHashJoin"), topk)
  }

  test("banded ngram dedup: candidates meet through the band equi-join, no all-pairs plan") {
    val p = plan("q_dedup_ngram")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("scale-path LSH queries: no cartesian/BNLJ anywhere in the plan") {
    for (q <- Seq("q_sim_neardup_lsh", "q_dedup_embed_lsh", "q_dedup_minhash_audit")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("q_dedup_substrings: joinless — window-key and doc-key shuffles only") {
    // the suffix-window formulation never pairs documents: the duplicate
    // mark is a min-window on the gram key and the island merge is a
    // doc-keyed window — no join node of any kind may appear, and the only
    // exchanges are gram-hash, doc-hash, and the output range sort
    val p = plan("q_dedup_substrings")
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    // count node-detail headers — the tree section prints each node twice
    val nExchange = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(nExchange <= 3, s"expected <=3 exchanges, got $nExchange:\n$p")
  }

  test("r6 third wave: scrub/encode/binary plans keep the family shapes") {
    // q_dedup_substrings_apply: same single window-hash shuffle as
    // q_dedup_substrings plus a doc-keyed agg + final sort — the splice is a
    // narrow HOF, so token rows never shuffle (<=3 hash exchanges) and no
    // join pairs documents
    val apply = plan("q_dedup_substrings_apply")
    assert(!apply.contains("CartesianProduct"), apply)
    val nEx = """\(\d+\) Exchange""".r.findAllIn(apply).length
    assert(nEx <= 3, s"expected <=3 exchanges, got $nEx:\n$apply")
    // q_text_rep_ngrams: counts + top-1 window only — NO join of any kind
    val rep = plan("q_text_rep_ngrams")
    assert(!rep.contains("Join"), rep)
    // q_sim_binary / q_text_bpe_apply / q_text_dup_ngrams: query/vocab/
    // coverage sides meet through broadcast or equi-joins, never a cartesian
    // (q_sim_binary_ivf's 8-row seed broadcast is a BNLJ by design, like
    // the rest of the IVF family — the pinned property is no cartesian)
    for (q <- Seq("q_sim_binary", "q_text_bpe_apply", "q_text_dup_ngrams",
        "q_sim_binary_ivf")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("r6 composition queries: no cartesian, candidates/terms meet through equi-joins") {
    // q_text_bm25: the query-term set broadcasts (tf materializes only for
    // query terms); q_text_ppl_gate: cutoffs ride broadcast 1-row aggs;
    // q_dedup_substrings_incremental: the delta meets the stored window
    // set through a left-semi equi-join on the hash
    for (q <- Seq("q_text_bm25", "q_text_ppl_gate", "q_dedup_substrings_incremental",
        "q_dedup_embed_incremental")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
    val inc = plan("q_dedup_substrings_incremental")
    assert(inc.contains("LeftSemi"), inc)
  }

  test("q_dedup_semantic: in-cell candidates meet through the cell equi-join, never a cartesian") {
    // the centroid assignment legitimately broadcasts the 8-row seed table
    // (a BNLJ by design, like the IVF family); the property that must hold
    // is that the corpus-x-corpus compare stage never materializes
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("centroid assignment is shuffle-free: no vec_id hash exchange anywhere in the IVF family") {
    // r7 verdict, systemic perf item: the old assignment idiom (crossJoin to
    // n·k rows + row_number() over PARTITION BY vec_id) exchanged the whole
    // corpus on vec_id at every assign. The shared broadcast-argmax helper
    // (VectorFunctions.nearestCentroid) folds the centroid array per row —
    // the corpus side of the assignment must carry NO hash exchange on
    // vec_id in any family member's plan. (Exchanges that remain are the
    // one-row centroid collect, broadcasts, cell/cent_id rollups, and
    // output sorts — none partition by vec_id.)
    for (q <- Seq("q_sim_outliers", "q_sim_ivf_ann", "q_dedup_semantic",
        "q_sim_binary_ivf", "q_sim_kmeans", "q_sim_ivf_trained",
        "q_sim_ann_filtered")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning(vec_id"),
        s"$q still shuffles the corpus on vec_id:\n$p")
    }
    // outliers is pure per-row assignment + rollup: the window operator
    // itself must be gone, not just its shuffle
    assert(!plan("q_sim_outliers").contains("Window"),
      "q_sim_outliers should have no window operator at all")
  }

  test("bounded exact audits: the vec_id bound is pushed down to the parquet scan") {
    // q_dedup_embed's FINAL plan cannot show the scan — Closure's per-round
    // localCheckpoints truncate lineage — so the pin targets the candidate
    // stage that actually reads parquet (the same code path the query runs).
    spark.catalog.clearCache() // direct explain below bypasses plan()'s guard
    val plans = Seq(
      "q_sim_neardup_pairs" -> plan("q_sim_neardup_pairs"),
      "q_dedup_embed(pairs stage)" -> graft.queries.SimilarityQueries
        .embedAuditPairs(spark, sf)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    for ((q, p) <- plans) {
      val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
      assert(pushed.contains("LessThan(vec_id,2000"), s"$q scan not bounded: $pushed")
    }
  }

  test("packBitmaps vocab numbering: rank window is hash-bucket-partitioned, not global") {
    // a global row_number would appear as a Window whose partition spec is
    // empty over the vocab relation; the partition-safe form windows by the
    // hash bucket. The only single-partition stage allowed is over the
    // constant-size bucket-count table. (r19) q_dedup_ngram moved to the
    // numbering-free sorted-string banded table, so the numbering window
    // is pinned on the minhash banded frame directly — q_dedup_minhash's
    // own final plan is lineage-truncated by Closure's localCheckpoints.
    val p = graft.queries.DedupQueries
      .bandedSparse(graft.queries.DedupQueries.docWordSets(spark, sf), "ws", 32, 8, 4)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val rnLines = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rnLines.nonEmpty, "expected the vocab rank window in the plan")
    assert(rnLines.forall(_.contains("bucket")), rnLines.mkString("\n"))
    // and the bigram banded table stays numbering-FREE: no vocab window,
    // no numbering join anywhere in q_dedup_ngram's plan (r19)
    val pn = plan("q_dedup_ngram")
    assert(!pn.contains("row_number()"), s"q_dedup_ngram vocab numbering came back:\n$pn")
  }

  test("q_join_asof / q_join_asof_forward: as-of is union + one key shuffle + window — NO Join node") {
    for (q <- Seq("q_join_asof", "q_join_asof_forward")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q:\n$p")
      assert(p.contains("Window"), s"$q:\n$p")
      assert(p.contains("Union"), s"$q:\n$p")
      // one hashpartitioning Exchange for the window; the only other
      // Exchange is the final ORDER BY's rangepartitioning
      val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
      assert(hashEx == 1, s"$q: expected exactly 1 hash Exchange, plan:\n$p")
    }
  }

  test("q_join_range: interval binning keeps the range join an equi-join — no BNLJ/cartesian") {
    val p = plan("q_join_range")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("q_contamination: eval/train n-grams meet through an equi-join, never pairwise") {
    val p = plan("q_contamination")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_contamination_bloom: the filter reaches the probe as a broadcast; no pairwise plan") {
    val p = plan("q_contamination_bloom")
    // the whole filter rides ONE broadcast map row (a 1-row broadcast
    // nested-loop cross, the broadcast-against-constant pattern), and the
    // exact confirm is a broadcast semi-join — a shuffled join on either
    // would defeat the operator's whole point
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("wave 4-7 queries: no pairwise plans; broadcasts where promised") {
    // NB classifier / LM orders / mixture: count-table equi-joins + ONE
    // broadcast-against-constant totals row — never a real cartesian
    Seq("q_text_nb_classifier", "q_text_perplexity3", "q_mix_quality",
        "q_sample_dsir").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
    // topics: centroid tables broadcast into every corpus-side join
    val topics = plan("q_text_topics")
    assert(topics.contains("BroadcastNestedLoopJoin") || topics.contains("BroadcastHashJoin"),
      topics)
    assert(!topics.contains("CartesianProduct"), topics)
    // decode-shaped queries: narrow — no join of any kind
    Seq("q_multimodal_phash", "q_multimodal_audio_dedup", "q_multimodal_scenes").foreach { q =>
      assert(!plan(q).contains("Join"), q)
    }
    // card/packing: single-pass aggregations (card's rollups via ONE Expand)
    assert(plan("q_train_dataset_card").contains("Expand"))
    assert(!plan("q_pack_buckets").contains("Join"))
    // radius near-dup: candidates meet through the band equi-join
    val radius = plan("q_multimodal_phash_radius")
    assert(!radius.contains("CartesianProduct"), radius)
  }

  test("r8 sketch/containment/fusion/event-series family: no pairwise plans; bounded sides broadcast") {
    Seq("q_dedup_containment", "q_agg_countmin", "q_agg_heavy_hitters",
        "q_sim_rrf", "q_events_markov", "q_events_anomaly", "q_events_resample",
        "q_agg_quantile_2pass").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian")
    }
    // heavy hitters: the recount touches the corpus through a BROADCAST
    // left-semi on the bounded candidate union — the full key distribution
    // must never shuffle
    val hh = plan("q_agg_heavy_hitters")
    assert(hh.contains("BroadcastHashJoin") && hh.contains("LeftSemi"), hh)
    // count-min: probes meet the 768-cell sketch through a broadcast equi-join
    assert(plan("q_agg_countmin").contains("BroadcastHashJoin"))
    // containment: docs meet ONLY through the shared-gram equi-join
    val cont = plan("q_dedup_containment")
    assert(!cont.contains("BroadcastNestedLoopJoin"), cont)
    // two-pass quantile: the only joins are the bounded bracketing join
    // (3 percentiles x ~160 buckets) and the broadcast of <=3 target rows
    // into the second scan — never an exchange-then-sort of the corpus
    val qt = plan("q_agg_quantile_2pass")
    assert(qt.contains("BroadcastHashJoin") || qt.contains("BroadcastNestedLoopJoin"), qt)
    // anomaly/resample windows partition by event_type over the bounded
    // spine — no global no-partition window over corpus-sized input
    Seq("q_events_anomaly", "q_events_resample").foreach { q =>
      val p = plan(q)
      assert(p.contains("Window"), s"$q lost its window")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("q_sort_topk_group: the typed top-k aggregate partial-aggregates before the exchange") {
    val p = plan("q_sort_topk_group")
    // partial ObjectHashAggregate (map side, bounded k-row buffers) +
    // final after the group exchange — ranking with count/sum economics;
    // a window formulation would instead sort every row per group
    assert(p.contains("ObjectHashAggregate"), p)
    val objAggCount = "ObjectHashAggregate".r.findAllIn(p).size
    assert(objAggCount >= 2, s"expected partial+final ObjectHashAggregate, got $objAggCount:\n$p")
    assert(!p.contains("Window"), "top-k agg must not fall back to a window")
  }

  test("q_agg_approx_set: sketches cross the exchange, not rows (partial-merge shape)") {
    val p = plan("q_agg_approx_set")
    // the HLL build/union aggregates run as ObjectHashAggregate with a
    // PARTIAL pass before the group exchange and a FINAL/MERGE pass after —
    // only fixed-size sketch bytes ride the shuffle (the r17 task-1
    // contract: pre-aggregated distinct counts without re-scanning rows)
    assert(p.contains("ObjectHashAggregate"), p)
    val objAggCount = "ObjectHashAggregate".r.findAllIn(p).size
    assert(objAggCount >= 2, s"expected partial+final ObjectHashAggregate, got $objAggCount:\n$p")
    assert(p.contains("hll_sketch_agg") && p.contains("hll_union_agg"),
      "the registered spellings must lower onto the native DataSketches aggregates")
    // the merged one-row estimate attaches via broadcast, never a shuffle
    // of the orders scan against it
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_agg_nary_extrema: bounded n-row partials cross the exchange, no window fallback") {
    val p = plan("q_agg_nary_extrema")
    assert(p.contains("ObjectHashAggregate"), p)
    val objAggCount = "ObjectHashAggregate".r.findAllIn(p).size
    assert(objAggCount >= 2, s"expected partial+final ObjectHashAggregate, got $objAggCount:\n$p")
    assert(!p.contains("Window"), "n-ary extrema must not fall back to a window sort")
  }

  test("q_sample_weighted / q_text_chunk: narrow shapes — no join anywhere") {
    assert(!plan("q_sample_weighted").contains("Join"))
    assert(!plan("q_text_chunk").contains("Join"))
  }

  test("q_mix_sources / q_text_repetition: narrow shapes — no join, no pre-sort exchange beyond the output sort") {
    // both ride the scan: a filter/explode (mix) and per-row kernel math
    // (repetition) with the ONLY exchange being the final presentation sort
    Seq("q_mix_sources", "q_text_repetition").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: $p")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, s"$q should only exchange for the output sort: $p")
    }
  }

  test("q_shuffle_order: position window partitions by shard bucket, never a global single-partition sort") {
    val p = plan("q_shuffle_order")
    // the window must carry the bucket partition key; a missing partition
    // spec would collapse the corpus order into one task at 100 TB
    assert(p.contains("Window"), p)
    assert(!p.toLowerCase.contains("partitionspec=[]"), p)
    assert(p.contains("hashpartitioning(bucket"), p)
  }

  test("q_join_fuzzy: candidates meet through the deletion-variant equi-join, never a cartesian") {
    // both fuzzy queries route through operators/FuzzyJoin since r6 — the
    // half-substring pigeonhole's digit-entropy-capped blocks saturated at
    // 10x (r5 verdict); deletion-variant blocks scale with the keyspace
    val p = plan("q_join_fuzzy")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_join_fuzzy_varlen: deletion-neighborhood candidates meet through the variant equi-join, never a cartesian") {
    val p = plan("q_join_fuzzy_varlen")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_join_fuzzy_varlen: every planted insert/delete edit is recovered (provable ed-1 recall)") {
    import org.apache.spark.sql.functions._
    // the B side plants one length-CHANGING edit per part (even keys delete
    // a char, odd keys insert one) — exactly the pairs the fixed-length
    // half-substring blocking of q_join_fuzzy cannot pair. The deletion
    // neighborhood must recover 100% of them.
    val out = SparkEntry.queries("q_join_fuzzy_varlen")(spark, sf)
      .select("key_a", "key_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nParts = spark.read.parquet(s"$sf/part.parquet").count()
    val planted = (0L until nParts).map(k => (k, k + 1000000L))
    val missed = planted.filterNot(out.contains)
    assert(missed.isEmpty, s"missed ${missed.size} of $nParts planted ed-1 pairs: ${missed.take(5)}")
    // and every planted pair really is a length change (insert or delete)
    val lens = SparkEntry.queries("q_join_fuzzy_varlen")(spark, sf)
      .filter(col("key_b") - col("key_a") === 1000000L && col("dist") === 1L)
      .select("len_a", "len_b").collect()
    assert(lens.nonEmpty && lens.forall(r => math.abs(r.getLong(0) - r.getLong(1)) == 1L))
  }

  test("kernel expressions participate in whole-stage codegen") {
    import org.apache.spark.sql.functions._
    // parquet-backed input so ConvertToLocalRelation can't pre-evaluate
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("a"))
    val df = e.select(graft.functions.VectorFunctions.dot(col("a"), col("a")).as("d"))
      .filter(col("d") > 0)
    // formatted mode marks codegen'd operators with `*` / "codegen id"
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("codegen id"), p)
    assert(p.contains("* Filter"), p)
    assert(df.count() > 0)
  }

  test("r8 diversity/privacy/sequence family: doc-local stays shuffle-free; windows keyed, top-k never global-sorts") {
    // lexical diversity is doc-LOCAL: the run-length fold must keep it a
    // pure scan→project — no aggregate, no join, the ONLY exchange is the
    // final presentation sort (the explode→groupBy formulation this
    // replaced shuffled the corpus at token scale, twice)
    val div = plan("q_text_diversity")
    assert(!div.contains("HashAggregate") && !div.contains("Join"), div)
    assert("Exchange".r.findAllIn(
      div.linesIterator.takeWhile(!_.startsWith("(1)")).mkString("\n")).size <= 2, div)
    // l-diversity: one corpus aggregate on the QI key (distinct-count is
    // two-level HashAggregate, both map-side partial) — no join, no window
    val ldiv = plan("q_privacy_ldiversity")
    assert(!ldiv.contains("Join") && !ldiv.contains("Window"), ldiv)
    // 3-step sequences: the corpus touches ONE user_id-keyed window (both
    // leads share it — a second Sort/Window pair would mean the frames
    // diverged), then the bounded triple table ranks via
    // TakeOrderedAndProject, never a global Sort of the corpus
    val seqp = plan("q_events_sequences")
    assert("\\bWindow\\b".r.findAllIn(
      seqp.linesIterator.takeWhile(!_.startsWith("(1)")).mkString("\n")).size == 1, seqp)
    assert(seqp.contains("TakeOrderedAndProject"), seqp)
    assert(!seqp.contains("CartesianProduct"), seqp)
    // recall eval: both legs meet the corpus through broadcasts (query
    // sample, centroids, probes) — the only non-broadcast join is the
    // bounded exact×ann list compare; never a cartesian of the corpus
    val rec = plan("q_sim_recall_eval")
    assert(!rec.contains("CartesianProduct"), rec)
    assert(rec.contains("BroadcastHashJoin") || rec.contains("BroadcastNestedLoopJoin"), rec)
    // change-point: one corpus hourly aggregate; every window (rank, cum,
    // running-min, first-crossing) partitions by event_type over the
    // bounded hourly spine — no unpartitioned window, no cartesian
    val cp = plan("q_events_changepoint")
    assert(!cp.contains("CartesianProduct"), cp)
    assert(cp.contains("windowspecdefinition(event_type"),
      s"change-point windows must partition by event_type:\n$cp")
    assert(!cp.contains("windowspecdefinition()"), "no unpartitioned window over the corpus")
  }

  test("q_scan_agg_pushdown: COUNT/MIN/MAX resolve from parquet footer stats") {
    val p = plan("q_scan_agg_pushdown")
    assert(p.contains("PushedAggregation: [COUNT(*)"), p)
    assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_linenumber)"), p)
    // the switch must stay on the isolated newSession: a later V1-pinned
    // query built from the SHARED session keeps its FileScan shape
    val v1 = plan("q_proj_filter")
    assert(v1.contains("Scan parquet") && !v1.contains("PushedAggregation"), v1)
  }

  test("q_profile family: one corpus pass — no join, no window, never a scan per column") {
    // multi-column exact distinct = grouping-sets Expand over ONE scan
    // (a per-column-subquery formulation would scan the corpus N times);
    // the single-distinct constraints query instead gets Catalyst's keyed
    // pre-aggregate (partial dedup on event_id before the exchange)
    val pc = plan("q_profile_columns")
    assert(pc.contains("Expand"), s"q_profile_columns lost the single-pass multi-distinct shape")
    Seq("q_profile_columns", "q_profile_constraints").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("Window"), p)
      assert("Scan parquet".r.findAllIn(p).size <= 2, s"$q scans the corpus more than once: $p")
    }
    // drift: the corpus meets only broadcast one-row frames (midpoint,
    // totals); PSI math runs on the bounded bin table — no window, no
    // corpus-side sort-merge join
    val dr = plan("q_profile_drift")
    assert(!dr.contains("SortMergeJoin") && !dr.contains("Window"), dr)
    assert(dr.contains("BroadcastNestedLoopJoin") || dr.contains("BroadcastHashJoin"), dr)
  }

  test("q_maint_zorder: morton layout audit is one bounded aggregate — no join, no window, no global sort") {
    val p = plan("q_maint_zorder")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // the bit-spread is column algebra inside the scan projection; the only
    // exchanges are the bounded file_id aggregate + presentation sort
    assert(p.contains("HashAggregate"), p)
    assert("Scan parquet".r.findAllIn(p).size <= 2, p)
  }

  test("q_graph_pagerank: iterative rounds over the cached co-partitioned adjacency; no cartesian, top-k never global-sorts") {
    // the declared query collects the bounded top-20 and unpersists its
    // caches (so bench loops don't leak storage); pin the DISTRIBUTED plan
    // via the exposed pipeline instead
    spark.catalog.clearCache()
    val (out, cached) = graft.queries.GraphQueries.pagerankFrames(spark, sf)
    try {
      val p = out.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("CartesianProduct"), p)
      // the adjacency is built once and reused every round from the cache
      assert(p.contains("InMemoryRelation"), "edge list must be cached across rounds")
      assert(p.contains("TakeOrderedAndProject"), "final top-20 must not global-sort")
    } finally cached.foreach(_.unpersist(true))
  }

  test("q_sim_ann_filtered: the metadata predicate reaches the parquet scan (pre-filter, not post-rank discard)") {
    val p = plan("q_sim_ann_filtered")
    // PushedFilters on label: the scan skips ineligible vectors before any
    // vector math — the whole point of the pre-filter strategy
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("label"), s"label predicate not pushed:\n$pushed")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sim_ann_postfilter: bounded candidate set broadcasts onto the label join; no vec_id exchange") {
    val p = plan("q_sim_ann_postfilter")
    // the post-filter's label lookup joins a BOUNDED frame (queries x
    // overFetch rows) against the corpus — it must broadcast, never
    // shuffle the corpus on vec_id; assignment stays broadcast-argmax
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("hashpartitioning(vec_id"),
      s"post-filter shuffles the corpus on vec_id:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_agg_collect: bound applied before collection; window and aggregate share one group-key exchange") {
    val p = plan("q_agg_collect")
    // the row_number bound must precede collect_list (no unbounded
    // aggregation buffer), and the window's hash partitioning on the
    // group key must be reused by the groupBy — one exchange total
    assert("Exchange hashpartitioning\\(o_orderpriority".r.findAllIn(p).size <= 1,
      s"window and aggregate re-exchange on the group key:\n$p")
  }

  test("q_sample_stratified: rate table broadcasts; membership filter never reads text; no corpus shuffle") {
    val p = plan("q_sample_stratified")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("hashpartitioning(doc_id"), s"corpus shuffled on doc_id:\n$p")
    // the sampler decides membership from (doc_id, lang) alone — a scan
    // that drags `text` along reads the whole corpus body for a filter
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("text"), s"unpruned scan:\n$readSchemas")
  }

  test("q_train_split3: one aggregate over the scan, no join, no window") {
    val p = plan("q_train_split3")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q_events_regularity: lag window and aggregate share ONE user exchange; top-20 never global-sorts") {
    val p = plan("q_events_regularity")
    assert(p.contains("TakeOrderedAndProject"), "bounded top-20 must not global-sort:\n" + p)
    // the window partitioning on user_id must be REUSED by the groupBy —
    // a second user_id exchange between them is the regression this pins
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size <= 1,
      s"window and aggregate re-exchange the corpus on user_id:\n$p")
  }

  test("q_join_star: Q5-shaped star join — every join an equi-join, the nation/region spine broadcast, date filter pushed to the orders scan") {
    val p = plan("q_join_star")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the pre-reduced nation⋈region spine must come in as a broadcast
    assert(p.contains("BroadcastHashJoin"), s"dimension spine not broadcast:\n$p")
    // the o_orderdate range must reach the parquet scan as a pushed filter
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(p).isDefined,
      s"date filter did not reach the orders scan:\n$p")
  }

  test("q_agg_mad / q_window_session: per-key windows and session merges never collapse to a single partition") {
    for (q <- Seq("q_agg_mad", "q_window_session")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition, "), s"$q went global:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }
    // the MAD medians come back as broadcast-sized joins, not shuffles of
    // the corpus against |types| rows
    assert(plan("q_agg_mad").contains("BroadcastHashJoin"),
      s"median join-back should broadcast:\n${plan("q_agg_mad")}")
  }

  test("q_recursive_cte: WITH RECURSIVE plans as the iterative loop — no cartesian, frontier join is an equi-join") {
    val p = plan("q_recursive_cte")
    assert(p.contains("UnionLoop"), s"recursion should plan as UnionLoop:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_join_salted: the join carries the salt key — the hot key spreads over R tasks, never one") {
    val p = plan("q_join_salted")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the equi-join condition must include BOTH k and salt; a plan that
    // dropped the salt re-concentrates 50% of the corpus on key 0
    assert("keys \\[2\\]: \\[k#\\d+L?, salt#\\d+L?\\]".r.findFirstIn(p).isDefined,
      s"join does not carry (k, salt) as its equi-keys:\n$p")
  }

  test("q_unpivot: wide-to-long is an Expand projection — no join, no shuffle before the output sort") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"), s"unpivot should plan as Expand:\n$p")
    assert(!p.contains("Join"), p)
    // the only exchange is the final presentation sort's range partitioning
    assert(!p.contains("Exchange hashpartitioning"), s"unpivot must not hash-shuffle:\n$p")
  }

  test("q_text_inverted_index: posting-list cap is a WindowGroupLimit; stats and postings meet on the term key") {
    val p = plan("q_text_inverted_index")
    // rn <= 8 must push into the window as a group-limit (partial before
    // the exchange), so per-term state is capped even for stopword terms
    assert(p.contains("WindowGroupLimit"), s"posting cap must push into the window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_cdc_upsert: latest-wins compaction is a window group limit; apply is ONE full-outer key join") {
    val p = plan("q_cdc_upsert")
    assert(p.contains("FullOuter"), s"merge apply must be a full outer join:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rn=1 compaction should group-limit:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_scd2 / q_events_interpolate: islands and neighbor windows stay key-partitioned — never a single-partition window") {
    for (q <- Seq("q_scd2", "q_events_interpolate")) {
      val p = plan(q)
      val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).mkString("\n")
      assert(!tree.contains("Join") || q == "q_events_interpolate", s"$q:\n$p")
      // every Window must carry a partition spec (user_id / event_type);
      // SinglePartition under a Window is the 1000x skew killer
      assert(!p.contains("Exchange SinglePartition, "), s"$q window went global:\n$p")
      assert(p.contains("Window"), s"$q:\n$p")
    }
  }

  test("q_graph_triangles: wedges meet through equi-joins, never an all-pairs plan") {
    spark.catalog.clearCache()
    val (out, cached) = graft.queries.GraphQueries.triangleFrames(spark, sf)
    try {
      val p = out.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("CartesianProduct"), s"all-pairs plan:\n$p")
      // the two wedge/closure joins are equi-joins (hash or sort-merge);
      // the only nested-loop is the broadcast of the 1-row max/total scalars
      val equiJoins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).size
      assert(equiJoins >= 2, s"expected >=2 equi-joins for wedge+closure:\n$p")
    } finally cached.foreach(_.unpersist(false))
  }

  test("q_train_curriculum: threshold phases, no global sort, windows over bounded shard partitions") {
    val p = plan("q_train_curriculum")
    assert(!p.contains("Join"), p)
    // exactly one Sort/Window pair for the (phase, bucket) position window
    // plus the final presentation sort — a global ntile/rank formulation
    // would add an unpartitioned window over the whole corpus
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).mkString("\n")
    assert("\\bWindow\\b".r.findAllIn(tree).size == 1, p)
    assert(p.contains("phase"), p)
  }

  test("catalog partition pruning holds on an hour-partitioned tree (PartitionProbe pin)") {
    // the standing in-suite twin of the 10^3/10^4 PartitionProbe runs
    // (r17 task 4): a registered reference-layout table must read exactly
    // the matching partitions' files — probe() asserts point=1 and day=24
    // from EXECUTED scan metrics and throws on any prune regression
    val base = java.nio.file.Files.createTempDirectory("graft_pprobe").toString + "/tree"
    graft.tools.PartitionProbe.buildTree(spark, base, 48)
    val line = graft.tools.PartitionProbe.probe(spark, base, 48)
    assert(line.contains("\"point_files_read\":1"), line)
    assert(line.contains("\"day_files_read\":24"), line)
  }
}
