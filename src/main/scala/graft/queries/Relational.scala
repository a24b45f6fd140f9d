package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.t
import graft.functions.{TextFunctions => TF}

/** SURVEY.md §2B relational corpus over the TPC-H-ish testdata.
  *
  * The reference delegates its entire query surface to Athena/Presto
  * (/root/reference/README.md:116 "any valid Presto SQL"); here each operator
  * class is declared as an idiomatic DataFrame/Catalyst query and verified
  * against the DuckDB oracle. Scale notes are inline per query: every join
  * states its expected physical strategy at 100 TB.
  */
object Relational {

  // -- projection / filter ---------------------------------------------------

  private val projFilter = Q(
    "q_proj_filter",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(
          col("l_returnflag") === "R" &&
            (col("l_linestatus") === "F" || col("l_quantity") > 45) &&
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz") &&
            col("l_linenumber").isin(1, 2, 3))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every output column so row order is deterministic (any
        // remaining ties are fully identical rows).
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_returnflag = 'R' AND (l_quantity > 45 OR l_linestatus = 'F')
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        AND l_linenumber IN (1, 2, 3)
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""))

  // -- aggregation -----------------------------------------------------------

  /** TPC-H Q1 shape: hash aggregate with map-side partial agg (free in
    * Catalyst); at 100 TB this is one shuffle on 2 low-cardinality keys. */
  private val aggGroup = Q(
    "q_agg_group",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(avg(l_discount), 6) AS avg_disc,
        count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  private val aggDistinct = Q(
    "q_agg_distinct",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("distinct_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val aggFilteredHaving = Q(
    "q_agg_filtered_having",
    (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
          round(max("o_totalprice"), 2).as("max_price"))
        .filter(col("n_orders") > 10)
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
        count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        round(max(o_totalprice), 2) AS max_price
      FROM orders GROUP BY o_orderpriority HAVING count(*) > 10
      ORDER BY o_orderpriority"""))

  private val aggRollup = Q(
    "q_agg_rollup",
    (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  private val aggCube = Q(
    "q_agg_cube",
    (s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), grouping("l_returnflag").cast("long").as("g_rf"))
        .orderBy(
          asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
          asc("n")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(grouping(l_returnflag) AS BIGINT) AS g_rf
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n"""))

  private val aggPercentile = Q(
    "q_agg_percentile",
    (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(percentile(col("o_totalprice"), lit(0.5)).cast("decimal(24,6)"), 2)
            .cast("double").as("median_price"),
          round(percentile(col("o_totalprice"), lit(0.9)).cast("decimal(24,6)"), 2)
            .cast("double").as("p90_price"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
        CAST(round(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(24,6)), 2) AS DOUBLE) AS median_price,
        CAST(round(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(24,6)), 2) AS DOUBLE) AS p90_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Explicit GROUPING SETS (beyond the rollup/cube shorthands), through
    * spark.sql so Catalyst's Expand handles it exactly as a SQL client would. */
  private val aggGroupingSets = Q(
    "q_agg_grouping_sets",
    (s, d) => {
      Tables.views(s, d, "lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
                 CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                 CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Pivot (Presto clients write this as conditional aggregation; Spark has
    * first-class `pivot`). Explicit value list keeps the plan single-pass —
    * no extra distinct-values job, which at 100 TB would be a full scan. */
  private val aggPivot = Q(
    "q_agg_pivot",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
        round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** UNPIVOT — pivot's inverse (ANSI/DuckDB UNPIVOT; Presto clients write
    * it as a CROSS JOIN UNNEST over (name, value) pairs; Spark has the
    * first-class `unpivot`). Wide-to-long is a NARROW per-row expansion —
    * Spark plans it as an Expand node (k output rows per input row, no
    * shuffle, no join), so it costs one scan at any scale. Measures are
    * cast to one decimal type first because unpivot requires a common
    * value type — the same coercion UNPIVOT does implicitly in DuckDB. */
  private val unpivotFn = Q(
    "q_unpivot",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          col("p_size").cast("decimal(18,2)").as("size"),
          col("p_retailprice").cast("decimal(18,2)").as("retailprice"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("size"), col("retailprice")),
          "measure", "value")
        .select(col("p_partkey"), col("measure"), col("value").cast("double").as("value"))
        .orderBy("p_partkey", "measure"),
    Some("""WITH p AS (SELECT p_partkey, CAST(p_size AS DECIMAL(18,2)) AS size,
                 CAST(p_retailprice AS DECIMAL(18,2)) AS retailprice FROM part)
      SELECT p_partkey, measure, CAST(value AS DOUBLE) AS value
      FROM (UNPIVOT p ON size, retailprice INTO NAME measure VALUE value)
      ORDER BY p_partkey, measure"""))

  /** Statistical aggregates: stddev / variance / correlation / covariance.
    * All are single-pass mergeable moments (partial agg below the shuffle,
    * like sum/count), so they cost the same one low-cardinality shuffle as
    * q_agg_group at any scale. */
  private val aggStats = Q(
    "q_agg_stats",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp("l_extendedprice").cast("decimal(24,6)"), 2).cast("double").as("sd_price"),
          round(var_samp("l_quantity").cast("decimal(24,6)"), 4).cast("double").as("var_qty"),
          round(corr("l_quantity", "l_extendedprice").cast("decimal(24,12)"), 6).cast("double").as("corr_qp"),
          round(covar_samp("l_quantity", "l_extendedprice").cast("decimal(24,6)"), 2).cast("double").as("cov_qp"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        CAST(round(CAST(stddev_samp(l_extendedprice) AS DECIMAL(24,6)), 2) AS DOUBLE) AS sd_price,
        CAST(round(CAST(var_samp(l_quantity) AS DECIMAL(24,6)), 4) AS DOUBLE) AS var_qty,
        CAST(round(CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(24,12)), 6) AS DOUBLE) AS corr_qp,
        CAST(round(CAST(covar_samp(l_quantity, l_extendedprice) AS DECIMAL(24,6)), 2) AS DOUBLE) AS cov_qp
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Presto min_by/max_by — "the argument at the extremum of another
    * expression", the idiomatic per-group argmax an Athena user reaches for
    * before discovering window functions. Ties on the raw price would make
    * the winner physical-order-dependent in BOTH engines (each keeps
    * whichever extremum row it sees first), so the ordering value is a
    * composite integer — price cents then orderkey — unique per group:
    * deterministic at any parallelism, same expression both sides. One
    * hash aggregate with map-side partials; the argmax state is one
    * (value, arg) pair per group, mergeable, so at 100 TB this is exactly
    * a sum-shaped aggregate — never a window sort. */
  private val aggMinMaxBy = Q(
    "q_agg_minmax_by",
    (s, d) =>
      t(s, d, "orders")
        .withColumn("score",
          round(col("o_totalprice") * 100).cast("long") * 100000000L + col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          max_by(col("o_orderkey"), col("score")).as("priciest_key"),
          min_by(col("o_orderkey"), col("score")).as("cheapest_key"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
        max_by(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey)
          AS priciest_key,
        min_by(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey)
          AS cheapest_key,
        count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Linear-regression aggregate family (regr_slope/intercept/r2/count/avgx
    * — ANSI + Presto; Spark ships them natively since 3.4). The moment
    * state is mergeable (one 6-tuple per group), so this is a sum-shaped
    * aggregate at any scale. Both engines accumulate in double with
    * different summation orders, so every continuous output rounds through
    * the decimal convention; regr_count is exact. */
  private val aggRegr = Q(
    "q_agg_regr",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")).cast("decimal(24,6)"), 2)
            .cast("double").as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")).cast("decimal(24,6)"), 2)
            .cast("double").as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")).cast("decimal(24,12)"), 6)
            .cast("double").as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")).cast("decimal(24,6)"), 4)
            .cast("double").as("avg_x"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        CAST(round(CAST(regr_slope(l_extendedprice, l_quantity) AS DECIMAL(24,6)), 2) AS DOUBLE) AS slope,
        CAST(round(CAST(regr_intercept(l_extendedprice, l_quantity) AS DECIMAL(24,6)), 2) AS DOUBLE) AS icept,
        CAST(round(CAST(regr_r2(l_extendedprice, l_quantity) AS DECIMAL(24,12)), 6) AS DOUBLE) AS r2,
        CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        CAST(round(CAST(regr_avgx(l_extendedprice, l_quantity) AS DECIMAL(24,6)), 4) AS DOUBLE) AS avg_x
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Higher-moment aggregates (Presto skewness/kurtosis). The engines'
    * BUILT-INS disagree by definition — Spark computes population moments
    * (skew = m3/m2^1.5, kurtosis = m4/m2^2 − 3), DuckDB bias-corrected
    * sample moments — so the oracle replays Spark's definition from raw
    * power sums (avg(x), avg(x²), avg(x³), avg(x⁴)): a first-principles
    * check of the moment algebra rather than a vendor-vs-vendor
    * coincidence. One mergeable moment tuple per group; sum-shaped. */
  private val aggMoments = Q(
    "q_agg_moments",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(skewness(col("l_quantity")).cast("decimal(24,12)"), 6)
            .cast("double").as("skew_qty"),
          round(kurtosis(col("l_quantity")).cast("decimal(24,12)"), 6)
            .cast("double").as("kurt_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""WITH m AS (
        SELECT l_returnflag,
               avg(l_quantity) AS m1, avg(l_quantity*l_quantity) AS p2,
               avg(l_quantity*l_quantity*l_quantity) AS p3,
               avg(l_quantity*l_quantity*l_quantity*l_quantity) AS p4,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag),
      c AS (
        SELECT l_returnflag, n,
               p2 - m1*m1 AS m2,
               p3 - 3*m1*p2 + 2*m1*m1*m1 AS m3,
               p4 - 4*m1*p3 + 6*m1*m1*p2 - 3*m1*m1*m1*m1 AS m4
        FROM m)
      SELECT l_returnflag,
        CAST(round(CAST(m3 / power(m2, 1.5) AS DECIMAL(24,12)), 6) AS DOUBLE) AS skew_qty,
        CAST(round(CAST(m4 / (m2*m2) - 3 AS DECIMAL(24,12)), 6) AS DOUBLE) AS kurt_qty,
        n
      FROM c ORDER BY l_returnflag"""))

  /** Bitwise aggregates (Presto/Trino bitwise_and_agg / bitwise_or_agg,
    * plus the XOR fold — Spark and DuckDB both spell them bit_and/bit_or/
    * bit_xor). XOR-folding a key column is the classic order-independent
    * reconciliation checksum for 100 TB table compares: one 64-bit
    * mergeable state per group, map-side combine reduces each partition
    * to a single row per group before the shuffle. The mixed key is
    * pre-reduced mod 2^31 BEFORE the Knuth-constant multiply so the
    * product is bounded by 2^31 * 2654435761 ≈ 5.7e18 < Long.MaxValue at
    * ANY corpus size — the raw `l_partkey * c` form throws under ANSI
    * mode once keys pass ~3.5e9 (≈ SF 17k), exactly the 100 TB regime the
    * checksum exists for (r12 ADVICE). The mod costs nothing the checksum
    * cares about: XOR over a deterministic per-row function of the keys
    * is equally order-independent and collision-sparse either way. */
  private val aggBitwise = Q(
    "q_agg_bitwise",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          bit_and(col("l_partkey")).as("and_pk"),
          bit_or(col("l_partkey")).as("or_pk"),
          bit_xor(
            pmod(col("l_partkey"), lit(2147483648L)) * 2654435761L +
              pmod(col("l_orderkey"), lit(2147483648L))).as("xor_checksum"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        bit_and(l_partkey) AS and_pk,
        bit_or(l_partkey) AS or_pk,
        bit_xor((CAST(l_partkey AS BIGINT) % 2147483648) * 2654435761
                + (CAST(l_orderkey AS BIGINT) % 2147483648)) AS xor_checksum,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Median absolute deviation — the robust dispersion statistic behind
    * outlier gates that stddev-based z-scores get wrong under heavy tails
    * (one corrupt feed value inflates σ and hides every other anomaly;
    * the MAD barely moves). Both medians are the LOWER median picked by
    * rank — element (n+1) div 2 under a total order with event_id
    * tie-break — so the statistic is an actual corpus element, never an
    * interpolated double, and the row is bit-exact across engines (the
    * cross-engine interpolation burn from round(double) never arises).
    * Shape: two (event_type)-keyed window ranks + one broadcast-sized
    * join back (|types| rows) — the corpus shuffles twice on the group
    * key and nothing else; the final outlier count reuses the second
    * pass's deviations. */
  private val aggMad = Q(
    "q_agg_mad",
    (s, d) => {
      val ev = t(s, d, "events").select(col("event_type"), col("event_id"), col("value"))
      val byType = Window.partitionBy("event_type")
      val ranked = ev
        .withColumn("rn", row_number().over(byType.orderBy("value", "event_id")))
        .withColumn("cnt", count(lit(1)).over(byType))
      val med = ranked.filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("event_type"), col("value").as("med"))
      val devs = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
      val rankedDev = devs
        .withColumn("rn", row_number().over(byType.orderBy("dev", "event_id")))
        .withColumn("cnt", count(lit(1)).over(byType))
      val mad = rankedDev.filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("event_type"), col("dev").as("mad"))
      devs.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(
          first("med").as("med"),
          first("mad").as("mad"),
          count(lit(1)).as("n"),
          count(when(col("dev") > col("mad") * 3, 1)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type, event_id, value FROM events),
      ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
        FROM ev),
      med AS (SELECT event_type, value AS med FROM ranked WHERE rn = (cnt + 1) // 2),
      devs AS MATERIALIZED (
        SELECT ev.event_type, ev.event_id, med, abs(value - med) AS dev
        FROM ev JOIN med USING (event_type)),
      rdev AS (
        SELECT event_type, dev,
               row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
        FROM devs),
      mad AS (SELECT event_type, dev AS mad FROM rdev WHERE rn = (cnt + 1) // 2)
      SELECT event_type, min(med) AS med, min(mad) AS mad,
             count(*) AS n,
             CAST(count(*) FILTER (WHERE dev > mad * 3) AS BIGINT) AS n_outliers
      FROM devs JOIN mad USING (event_type)
      GROUP BY event_type ORDER BY event_type"""))

  /** Boolean aggregates (bool_and/bool_or — ANSI EVERY/ANY; Presto ships
    * both) plus the filtered-count idiom. Three one-bit mergeable states —
    * map-side combine reduces each partition to a single row per group. */
  private val aggBool = Q(
    "q_agg_bool",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          bool_and(col("l_quantity") > 0).as("all_pos_qty"),
          bool_or(col("l_discount") > 0.09).as("any_deep_disc"),
          count_if(col("l_tax") > 0.05).as("n_high_tax"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        bool_and(l_quantity > 0) AS all_pos_qty,
        bool_or(l_discount > 0.09) AS any_deep_disc,
        CAST(count(*) FILTER (l_tax > 0.05) AS BIGINT) AS n_high_tax,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Mergeable HLL sketches (DataSketches) — the 100 TB distinct-count
    * pattern: build one tiny sketch per partition slice (here: per month),
    * then union sketches instead of ever rescanning rows. Sketch state is
    * order-insensitive, so the estimate is deterministic; the declared check
    * is the same 5%-of-exact contract as q_agg_approx_distinct. */
  private val aggHllMerge = Q(
    "q_agg_hll_merge",
    (s, d) => {
      val o = t(s, d, "orders")
      val monthly = o
        .groupBy(month(col("o_orderdate")).as("mo"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val merged = monthly
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
      o.agg(countDistinct("o_custkey").as("exact_custs"))
        .crossJoin(merged)
        .select(
          col("exact_custs"),
          (abs(col("merged_est") - col("exact_custs")) <
            col("exact_custs") * 0.05).as("within_5pct"))
    },
    Some("""SELECT count(DISTINCT o_custkey) AS exact_custs,
        abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
          < count(DISTINCT o_custkey) * 0.05 AS within_5pct
      FROM orders"""))

  /** Presto's mergeable-HLL spellings (r17 verdict missing #1) end to end:
    * per-priority `approx_set(o_custkey)`, rolled up with `merge(sk)` and
    * read with `cardinality(...)` — the pre-aggregated distinct-count
    * dashboard idiom over security events, here through the Column wrappers
    * that construct the exact expressions the registered SQL names lower
    * onto (EngineSpec pins the pasted-SQL spellings on an extensions
    * session; PlansSpec pins the partial-merge shape — sketches cross the
    * exchange, not rows). Same 5%-of-exact declared contract as
    * q_agg_hll_merge: the estimate is order-insensitive, so the boolean is
    * deterministic and DuckDB asserts the same property off its own HLL. */
  private val aggApproxSet = Q(
    "q_agg_approx_set",
    (s, d) => {
      import graft.functions.PrestoHllFunctions._
      val o = t(s, d, "orders")
      val per = o.groupBy(col("o_orderpriority"))
        .agg(approxSet(col("o_custkey")).as("sk"))
      val merged = per.agg(hllCardinality(mergeHll(col("sk"))).as("est"))
      o.agg(countDistinct("o_custkey").as("exact_custs"))
        .crossJoin(broadcast(merged))
        .select(
          col("exact_custs"),
          (abs(col("est") - col("exact_custs")) <
            col("exact_custs") * 0.05).as("within_5pct"))
    },
    Some("""SELECT count(DISTINCT o_custkey) AS exact_custs,
        abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
          < count(DISTINCT o_custkey) * 0.05 AS within_5pct
      FROM orders"""))

  /** Presto's n-ary extrema forms (r17 verdict missing #2) — all four
    * spellings in one row: max(x, n) / min(x, n) rank by the value itself,
    * max_by(x, y, n) / min_by(x, y, n) rank by a separate key (here the
    * UNIQUE o_orderkey, so tie order — arbitrary in Presto — cannot enter
    * the hash). Runs through the Column wrappers constructing the exact
    * NAryExtremaAgg lowering the shadowed SQL names build (EngineSpec pins
    * the pasted-SQL spellings and the array-of-n semantics). DuckDB 1.0
    * lacks the n-ary forms, so the oracle reconstructs each array with
    * list_sort + slice — an independent formulation, not an echo. Scale
    * shape: bounded n-row partials per group per map task cross the
    * exchange (TopKByValue economics, generalized to any orderable key). */
  private val aggNaryExtrema = Q(
    "q_agg_nary_extrema",
    (s, d) => {
      import graft.functions.NAryExtremaFunctions._
      // arrays serialize to CSV for the driver gate (atomic columns only);
      // every ranked column is BIGINT so serialization is format-exact
      def csv(c: String) = expr(s"array_join(transform($c, x -> CAST(x AS STRING)), ',')")
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          maxN(col("o_orderkey"), 3).as("top3a"),
          minN(col("o_orderkey"), 3).as("bot3a"),
          maxByN(col("o_custkey"), col("o_orderkey"), 3).as("cust_topa"),
          minByN(col("o_custkey"), col("o_orderkey"), 3).as("cust_bota"))
        .select(col("o_orderpriority"),
          csv("top3a").as("top3"), csv("bot3a").as("bot3"),
          csv("cust_topa").as("cust_of_top3_keys"),
          csv("cust_bota").as("cust_of_bot3_keys"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
        array_to_string(list_sort(list(o_orderkey), 'DESC')[1:3], ',') AS top3,
        array_to_string(list_sort(list(o_orderkey), 'ASC')[1:3], ',') AS bot3,
        array_to_string(list_transform(
          list_sort(list(struct_pack(k := o_orderkey, v := o_custkey)), 'DESC')[1:3],
          r -> r.v), ',') AS cust_of_top3_keys,
        array_to_string(list_transform(
          list_sort(list(struct_pack(k := o_orderkey, v := o_custkey)), 'ASC')[1:3],
          r -> r.v), ',') AS cust_of_bot3_keys
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Presto's ORDER BY-inside-array_agg (r17 verdict missing #3), pasted
    * VERBATIM through [[graft.Engine.sql]]'s pre-parse rewrite
    * (Engine.rewriteOrderedArrayAgg — Spark's grammar rejects the form, so
    * no function registration can intercept it). Two keys with MIXED
    * directions (price DESC, key ASC tiebreak) exercise the generated
    * multi-key comparator; the unique tiebreak pins determinism. The
    * oracle runs DuckDB's NATIVE ORDER BY-inside-aggregate — the rewrite
    * is checked against a first-class implementation, not an echo. The
    * filter bounds per-group payload (the bounded-before-collect
    * discipline q_agg_collect documents). */
  private val aggArrayOrdered = Q(
    "q_agg_array_ordered",
    (s, d) => {
      Tables.views(s, d, "orders")
      // the ordered aggregate rides INSIDE an ordinary call chain — the
      // pre-parse rewrite is text-local, so nesting must work; the CSV
      // serialization satisfies the driver gate's atomic-columns contract
      graft.Engine.sql(s,
        """SELECT o_orderpriority,
               array_join(transform(
                 array_agg(o_orderkey ORDER BY o_totalprice DESC, o_orderkey),
                 x -> CAST(x AS STRING)), ',') AS keys_by_price
           FROM orders WHERE o_orderkey % 97 = 0
           GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority,
        array_to_string(array_agg(o_orderkey ORDER BY o_totalprice DESC, o_orderkey),
          ',') AS keys_by_price
      FROM orders WHERE o_orderkey % 97 = 0
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Presto's WEIGHTED approx_percentile(x, w, p) — the latency-dashboard
    * idiom — through the shadow dispatch's lowering onto Spark's EXACT
    * Percentile-with-frequency (exact satisfies the approx contract; the
    * Column wrapper constructs the identical expression for the vanilla
    * Verify session, EngineSpec pins the pasted SQL shapes). The oracle
    * reconstructs the weighted percentile from first principles: rows
    * EXPANDED by weight, then quantile_cont — DuckDB's type-7 interpolation
    * over the expanded multiset is exactly Percentile's
    * sorted-with-frequencies formula. Decimal-rounded on both sides (the
    * project's float-boundary convention). Scale shape: one
    * ObjectHashAggregate family per group, partial-merged; weights ride as
    * counts, never expanded rows, on the Spark side. */
  private val aggWeightedPercentile = Q(
    "q_agg_weighted_percentile",
    (s, d) => {
      import graft.functions.PrestoPercentileFunctions.weightedPercentile
      def r2(c: org.apache.spark.sql.Column) =
        round(c.cast("decimal(24,6)"), 2).cast("double")
      val w = (col("o_orderkey") % 5 + 1).cast("long")
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          r2(weightedPercentile(col("o_totalprice"), w, 0.5)).as("wp50"),
          r2(weightedPercentile(col("o_totalprice"), w, 0.9)).as("wp90"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH expanded AS (
        SELECT o_orderpriority, o_totalprice
        FROM (SELECT o_orderpriority, o_totalprice,
                unnest(range(CAST(o_orderkey % 5 + 1 AS INT))) AS rep
              FROM orders))
      SELECT o_orderpriority,
        CAST(round(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(24,6)), 2) AS DOUBLE) AS wp50,
        CAST(round(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(24,6)), 2) AS DOUBLE) AS wp90
      FROM expanded GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  private val aggApproxDistinct = Q(
    // approx_count_distinct (HLL) is nondeterministic across engines, so the
    // declared check is the HLL estimate's contract: within 5% of exact.
    // Expressed as a boolean so the oracle can assert the same property.
    "q_agg_approx_distinct",
    (s, d) =>
      t(s, d, "lineitem")
        .agg(
          countDistinct("l_partkey").as("exact_parts"),
          approx_count_distinct("l_partkey").as("approx_raw"))
        .select(
          col("exact_parts"),
          (abs(col("approx_raw") - col("exact_parts")) <
            col("exact_parts") * 0.05).as("within_5pct")),
    Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
        abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
          < count(DISTINCT l_partkey) * 0.05 AS within_5pct
      FROM lineitem"""))

  // -- joins -----------------------------------------------------------------

  /** orders⋈customer is the big shuffle join (both sides large at 100 TB,
    * sort-merge w/ AQE); nation is tiny → explicit broadcast. */
  private val joinInner = Q(
    "q_join_inner",
    (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("n_name"),
    Some("""SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  private val joinLeft = Q(
    "q_join_left",
    (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
        round(coalesce(sum(o_totalprice), 0), 2) AS spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  private val joinSemi = Q(
    "q_join_semi",
    (s, d) =>
      t(s, d, "orders")
        .join(
          t(s, d, "lineitem").filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      ORDER BY o_orderkey"""))

  private val joinAnti = Q(
    "q_join_anti",
    (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** Bucketed co-located join (SURVEY §2B joins row, the pre-partitioning
    * scale technique): both sides written bucketed+sorted on the join key,
    * so the sort-merge join reads co-located buckets with NO shuffle on
    * either side — at 100 TB this is the difference between a full-table
    * exchange and none. PlansSpec pins the exchange count against the
    * unbucketed twin. The merge hint keeps the demo honest (broadcast would
    * otherwise win at this scale factor). */
  private val joinBucketed = Q(
    "q_join_bucketed",
    (s, d) => {
      val tag = d.replaceAll("[^a-z0-9]", "_")
      val ob = s"orders_b_$tag"
      val lb = s"lineitem_b_$tag"
      // guard each table independently: a crash between the two writes must
      // not leave a half-created state that every later run then skips
      if (!s.catalog.tableExists(ob)) {
        t(s, d, "orders").write.mode("overwrite")
          .option("path", s"/tmp/graft_bucketed/$ob")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ob)
      }
      if (!s.catalog.tableExists(lb)) {
        t(s, d, "lineitem").write.mode("overwrite")
          .option("path", s"/tmp/graft_bucketed/$lb")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lb)
      }
      s.table(ob).hint("merge")
        .join(s.table(lb), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum("l_extendedprice"), 2).as("rev"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, round(sum(l_extendedprice), 2) AS rev, count(*) AS n
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Full outer join where BOTH sides have unmatched rows (each side is
    * filtered independently). At 100 TB: full outer cannot broadcast —
    * sort-merge on the key, AQE handles skew. */
  private val joinFull = Q(
    "q_join_full",
    (s, d) => {
      val c = t(s, d, "customer")
        .filter(col("c_acctbal") > 8000)
        .select("c_custkey", "c_acctbal")
      val o = t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("spend"))
        .filter(col("spend") > 700000)
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("spend"))
        .orderBy("custkey")
    },
    Some("""SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, spend
      FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000) c
      FULL OUTER JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
                       FROM orders GROUP BY o_custkey
                       HAVING round(sum(o_totalprice), 2) > 700000) o
        ON c_custkey = o_custkey
      ORDER BY custkey"""))

  /** Right outer join (symmetric twin of q_join_left, declared separately
    * so the §2B joins row is covered line-by-line). */
  private val joinRight = Q(
    "q_join_right",
    (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  /** Cross join of two tiny distinct sets — 5 regions × order priorities.
    * Only ever sane when at least one side is tiny (broadcast nested loop);
    * the engine never plans a large×large cross product in this corpus. */
  private val joinCross = Q(
    "q_join_cross",
    (s, d) =>
      t(s, d, "region").select("r_name")
        .crossJoin(t(s, d, "orders").select("o_orderpriority").distinct())
        .orderBy("r_name", "o_orderpriority"),
    Some("""SELECT r_name, o_orderpriority
      FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
      ORDER BY r_name, o_orderpriority"""))

  /** Non-equi (theta) join; both sides tiny → broadcast nested loop is the
    * right plan and the only one Spark can pick here. */
  private val joinTheta = Q(
    "q_join_theta",
    (s, d) =>
      t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") < col("r_regionkey"))
        .select("r_regionkey", "n_nationkey")
        .orderBy("r_regionkey", "n_nationkey"),
    Some("""SELECT r_regionkey, n_nationkey FROM region
      JOIN nation ON n_regionkey < r_regionkey
      ORDER BY r_regionkey, n_nationkey"""))

  /** Null-safe equi-join (ANSI IS NOT DISTINCT FROM; Spark's `<=>`):
    * NULL keys PAIR instead of dropping — the semantics migrants hit when
    * joining on nullable enrichment columns. Keys are made nullable with
    * nullif (nation 3 → NULL on both sides), so the row proves both
    * halves: NULL==NULL matches (the nation-3 group survives under the
    * 'NULL' label) and ordinary keys join as usual. Executes as a plain
    * hash join — Spark plans `<=>` as an equi-join key, NOT a nested
    * loop, which is why it scales like q_join_inner. Aggregated per key
    * class to keep the declared output bounded. */
  private val joinNullsafe = Q(
    "q_join_nullsafe",
    (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"), nullif(col("c_nationkey"), lit(3)).as("ck"))
        .join(
          t(s, d, "supplier")
            .select(col("s_suppkey"), nullif(col("s_nationkey"), lit(3)).as("sk")),
          col("ck") <=> col("sk"))
        .groupBy(coalesce(col("ck").cast("string"), lit("NULL")).as("key_class"))
        .agg(count(lit(1)).as("n_pairs"),
          min("c_custkey").as("min_cust"),
          max("s_suppkey").as("max_supp"))
        .orderBy("key_class"),
    Some("""SELECT coalesce(CAST(ck AS VARCHAR), 'NULL') AS key_class,
        count(*) AS n_pairs,
        min(c_custkey) AS min_cust,
        max(s_suppkey) AS max_supp
      FROM (SELECT c_custkey, nullif(c_nationkey, 3) AS ck FROM customer) c
      JOIN (SELECT s_suppkey, nullif(s_nationkey, 3) AS sk FROM supplier) s
        ON ck IS NOT DISTINCT FROM sk
      GROUP BY 1 ORDER BY key_class"""))

  /** Multiway star join — the TPC-H Q5 shape (local-supplier revenue by
    * nation): two FACT tables meet on their natural key (lineitem⋈orders,
    * the one unavoidable big shuffle), then the dimension spine
    * (supplier, customer, nation⋈region) hangs off it. nation⋈region is
    * pre-reduced and EXPLICITLY broadcast; supplier/customer are left to
    * Catalyst/AQE — broadcast at sandbox scale, shuffle-hash at 100 TB
    * where they are fact-sized, with the c_nationkey = s_nationkey
    * residual riding the custkey equi-join rather than forcing a second
    * shuffle. The o_orderdate range filter sits under the first join so
    * partition-level stats can prune before any exchange. Revenue is an
    * exact decimal product summed in decimal(38,4) (the int64-overflow /
    * float-associativity double burn), cast to double only at the
    * output. */
  private val joinStar = Q(
    "q_join_star",
    (s, d) => {
      val nationAsia = t(s, d, "nation")
        .join(
          t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val items = t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .as("rev"))
      items
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nationAsia), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum("rev").cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** Salted skew join — the MANUAL skew-handling algebra, declared (AQE's
    * automatic skew split is pinned on an executed plan in OperatorsSpec;
    * this row proves the hand-rolled form gives the identical answer,
    * because AQE only rescues SORT-MERGE joins and a skewed key meeting a
    * non-broadcastable dim through a shuffled-hash join still needs the
    * salt). The probe key is engineered skewed — HALF of lineitem lands
    * on key 0 — so an unsalted shuffle join would put 50% of the corpus
    * in one task at any scale. Salting: the fact side takes a
    * deterministic salt in [0, R); the dim side cross-joins the salt
    * domain (R=8 replicas of a |keys|-row table — bytes), and the join
    * runs on (k, salt), spreading the hot key over R tasks. The ORACLE is
    * the PLAIN unsalted join: the row certifies result-equivalence of the
    * rewrite, not just that it runs. Weighted sums in exact decimal. */
  private val joinSalted = Q(
    "q_join_salted",
    (s, d) => {
      val R = 8
      val facts = t(s, d, "lineitem").select(
        when(col("l_orderkey") % 10 < 5, lit(0L))
          .otherwise(col("l_orderkey") % 1000).as("k"),
        col("l_quantity"), col("l_returnflag"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(R)).as("salt"))
      val dim = t(s, d, "orders")
        .select((col("o_orderkey") % 1000).as("k")).distinct()
        .withColumn("factor", col("k") * 7 % 13 + 1)
        .withColumn("salt", explode(sequence(lit(0L), lit(R - 1L))))
      facts.join(dim, Seq("k", "salt"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)") * col("factor"))
            .cast("double").as("weighted_qty"),
          countDistinct("k").as("n_keys"))
        .orderBy("l_returnflag")
    },
    Some("""WITH facts AS (
        SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0 ELSE l_orderkey % 1000 END AS k,
               l_quantity, l_returnflag
        FROM lineitem),
      dim AS (
        SELECT k, k * 7 % 13 + 1 AS factor
        FROM (SELECT DISTINCT o_orderkey % 1000 AS k FROM orders))
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * factor) AS DOUBLE) AS weighted_qty,
             CAST(count(DISTINCT k) AS BIGINT) AS n_keys
      FROM facts JOIN dim USING (k)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Recursive CTE — Spark 4.1's `WITH RECURSIVE` (SPARK-24497; planned as
    * an iterative UnionLoop) against DuckDB's native recursive CTE: the
    * hierarchy-traversal idiom (org charts, BOM explosions, graph
    * reachability) that previously forced the driver-side loops the graph
    * rows use. The hierarchy is derived, not stored: parent(k) = k div 10
    * makes customers a forest rooted at custkeys < 10, so BOTH engines
    * construct the identical edges from first principles and the recursion
    * depth is log10(max key) — it grows by ONE level per 10x of corpus,
    * the scale-stable shape for an iterative plan (each round is one
    * frontier⋈customer equi-join; the frontier is level-sized). Per-depth
    * aggregate output keeps the row bounded at any SF. */
  private val recursiveCte = Q(
    "q_recursive_cte",
    (s, d) => {
      t(s, d, "customer").select("c_custkey")
        .createOrReplaceTempView("graft_rcte_customer")
      s.sql("""
        WITH RECURSIVE anc(custkey, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM graft_rcte_customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, a.root, a.depth + 1
          FROM graft_rcte_customer c JOIN anc a ON c.c_custkey div 10 = a.custkey
          WHERE c.c_custkey >= 10)
        SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n,
               CAST(count(DISTINCT root) AS BIGINT) AS n_roots,
               CAST(sum(custkey) AS BIGINT) AS key_sum
        FROM anc GROUP BY depth ORDER BY depth""")
    },
    Some("""WITH RECURSIVE anc(custkey, root, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, a.root, a.depth + 1
        FROM customer c JOIN anc a ON c.c_custkey // 10 = a.custkey
        WHERE c.c_custkey >= 10)
      SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n,
             CAST(count(DISTINCT root) AS BIGINT) AS n_roots,
             CAST(sum(custkey) AS BIGINT) AS key_sum
      FROM anc GROUP BY depth ORDER BY depth"""))

  /** Correlated LATERAL subquery — Presto/ANSI's per-row derived table
    * (top-2 orders per customer here). Catalyst DECORRELATES the
    * limit+sort lateral into a window-rank over one equi-join, so the
    * physical plan is q_window_topk's shape (one shuffle on the join key),
    * not a per-row re-execution — which is the whole point of running it
    * through the optimizer instead of a driver loop. Customers with no
    * orders drop (inner lateral), matching the oracle. */
  private val joinLateral = Q(
    "q_join_lateral",
    (s, d) => {
      Tables.views(s, d, "customer", "orders")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
               FROM customer c,
               LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
               ORDER BY c.c_custkey, t.o_orderkey""")
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_orderkey"""))

  /** listagg / string_agg — the ANSI ordered string-concatenation
    * aggregate (Presto ships listagg; Spark since 4.0). WITHIN GROUP
    * ordering makes the result deterministic; grouped over the tiny
    * nation dim so the concatenated payload stays bounded — unbounded
    * listagg at corpus scale is q_agg_collect's bounded-before-collect
    * problem, documented there. */
  private val aggListagg = Q(
    "q_agg_listagg",
    (s, d) => {
      Tables.views(s, d, "nation")
      s.sql("""SELECT CAST(n_regionkey AS BIGINT) AS region,
                      listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
                      CAST(count(*) AS BIGINT) AS n
               FROM nation GROUP BY n_regionkey ORDER BY region""")
    },
    Some("""SELECT CAST(n_regionkey AS BIGINT) AS region,
        string_agg(n_name, ',' ORDER BY n_name) AS names,
        count(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY region"""))

  /** Presto `multimap_agg(k, v)` — the key→array-of-values collection
    * aggregate (r13 verdict missing #4; map_agg/histogram/array_agg are
    * q_agg_histogram/q_agg_collect's). Spark has no multimap_agg spelling;
    * the idiomatic plan is the same shape Presto executes underneath: a
    * two-level aggregation (group → key collects its value list, then
    * group collects its key→list entries). Output is serialized per the
    * repo's array_join convention (the driver gate cannot sort+hash a map
    * column) with BOTH levels sorted, so the string is deterministic. The
    * o_orderkey bound keeps the per-cell payload bounded — unbounded
    * per-key value lists at corpus scale are q_agg_collect's documented
    * bounded-before-collect problem. Scale shape: two exchanges, both on
    * grouping keys, partial aggregation on each. */
  private val aggMultimap = Q(
    "q_agg_multimap",
    (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 3000)
        .groupBy(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
        .agg(array_join(array_sort(collect_list(col("o_orderkey").cast("string"))), "|")
          .as("vs"))
        .groupBy("prio")
        .agg(
          array_join(array_sort(collect_list(concat(col("status"), lit(":"), col("vs")))), ",")
            .as("multimap"),
          count(lit(1)).as("n_keys"))
        .orderBy("prio"),
    Some("""WITH kv AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status,
          string_agg(CAST(o_orderkey AS VARCHAR), '|'
                     ORDER BY CAST(o_orderkey AS VARCHAR)) AS vs
        FROM orders WHERE o_orderkey < 3000 GROUP BY 1, 2)
      SELECT prio,
        string_agg(status || ':' || vs, ',' ORDER BY status || ':' || vs) AS multimap,
        count(*) AS n_keys
      FROM kv GROUP BY prio ORDER BY prio"""))

  /** Presto `map_agg(k, v)` through the REGISTERED aggregate itself
    * ([[graft.functions.PrestoMapAgg]] — r16 verdict missing #1; the
    * composed-primitive spelling is q_agg_histogram's). The inner count
    * makes (prio, status) keys DISTINCT, so Presto's
    * arbitrary-value-on-duplicate caveat never fires and the map is
    * well-defined on any engine. The map is consumed AS a map — entry
    * serialization, key count, and an aggregate() fold over map_values —
    * the q_agg_map_union round-trip discipline (the driver gate cannot
    * sort+hash a map column). Scale shape: two exchanges on grouping
    * keys; the typed aggregate partials merge map-side like
    * collect_list's. */
  private val aggMapAgg = Q(
    "q_agg_map_agg",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("prio")
        .agg(graft.functions.MapAggFunctions.mapAgg(col("status"), col("cnt")).as("m"))
        .select(
          col("prio"),
          array_join(array_sort(
            expr("transform(map_entries(m), e -> concat(e.key, ':', e.value))")), ",")
            .as("map_agg"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("total"))
        .orderBy("prio"),
    Some("""WITH kv AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status, count(*) AS cnt
        FROM orders GROUP BY 1, 2)
      SELECT prio,
        string_agg(status || ':' || CAST(cnt AS VARCHAR), ','
                   ORDER BY status || ':' || CAST(cnt AS VARCHAR)) AS map_agg,
        count(*) AS n_keys,
        CAST(sum(cnt) AS BIGINT) AS total
      FROM kv GROUP BY prio ORDER BY prio"""))

  /** Presto `histogram(x)` through the REGISTERED aggregate
    * ([[graft.functions.PrestoHistogramAgg]]). Note the PLAN difference
    * from q_agg_histogram's composed spelling: the typed aggregate counts
    * into per-group maps map-side and merges partials, so the whole
    * histogram is ONE exchange where the two-level groupBy spelling needs
    * two — at 100 TB that is the difference between shuffling
    * |priorities×statuses| partial maps and shuffling the (much larger)
    * (priority, status) pair stream twice. */
  private val aggHistogramPresto = Q(
    "q_agg_histogram_presto",
    (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(graft.functions.MapAggFunctions.histogramAgg(col("o_orderstatus")).as("m"))
        .select(
          col("o_orderpriority"),
          array_join(array_sort(
            expr("transform(map_entries(m), e -> concat(e.key, ':', e.value))")), ",")
            .as("histogram"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .orderBy("o_orderpriority"),
    Some("""WITH c AS (
        SELECT o_orderpriority, o_orderstatus || ':' || CAST(count(*) AS VARCHAR) AS e
        FROM orders GROUP BY o_orderpriority, o_orderstatus)
      SELECT o_orderpriority, array_to_string(list_sort(list(e)), ',') AS histogram,
        count(*) AS n_keys
      FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Presto `multimap_agg(k, v)` through the REGISTERED aggregate
    * ([[graft.functions.PrestoMultimapAgg]]) — same declared contract as
    * q_agg_multimap's composed two-level spelling (both serialize sorted,
    * so the nondeterministic arrival order inside each value list cannot
    * reach the hash), but executed as ONE typed aggregate: per-key value
    * lists build map-side and concatenate in merge, one exchange total.
    * The o_orderkey bound keeps per-key lists bounded (q_agg_collect's
    * documented discipline). */
  private val aggMultimapPresto = Q(
    "q_agg_multimap_presto",
    (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 3000)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(graft.functions.MapAggFunctions
          .multimapAgg(col("o_orderstatus"), col("o_orderkey")).as("mm"))
        .select(
          col("prio"),
          array_join(array_sort(expr(
            "transform(map_entries(mm), e -> concat(e.key, ':', " +
              "array_join(array_sort(transform(e.value, x -> cast(x AS string))), '|')))")), ",")
            .as("multimap"),
          size(map_keys(col("mm"))).cast("long").as("n_keys"))
        .orderBy("prio"),
    Some("""WITH kv AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status,
          string_agg(CAST(o_orderkey AS VARCHAR), '|'
                     ORDER BY CAST(o_orderkey AS VARCHAR)) AS vs
        FROM orders WHERE o_orderkey < 3000 GROUP BY 1, 2)
      SELECT prio,
        string_agg(status || ':' || vs, ',' ORDER BY status || ':' || vs) AS multimap,
        count(*) AS n_keys
      FROM kv GROUP BY prio ORDER BY prio"""))

  /** Presto `map_union(m)` — the map-MERGE aggregate completing the map
    * collection family (r14 verdict missing #3; map_agg/histogram/
    * multimap_agg are q_agg_histogram/q_agg_multimap's). The row builds
    * per-(prio, status) count maps — each a single-entry map(status →
    * count), the canonical partial-histogram shape map_union merges —
    * then unions them per prio into one REAL map column
    * (map_from_entries over the sorted entry collect, so key order is
    * deterministic by the q_agg_multimap sorted-collect convention; keys
    * are distinct by construction, so Presto's arbitrary-choice-on-
    * duplicate-keys caveat never fires and the result is well-defined on
    * any engine). The map is then CONSUMED as a map — serialized from
    * map_entries and totaled with an aggregate() HOF fold over
    * map_values — so the declared row proves the round trip through the
    * map type, not just a string of it (the driver gate cannot sort+hash
    * a map column, hence the serialized output). Scale shape: two
    * exchanges, both on grouping keys, partial aggregation on each; the
    * per-group map is bounded by the status-key cardinality. */
  private val aggMapUnion = Q(
    "q_agg_map_union",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("prio")
        .agg(map_from_entries(array_sort(collect_list(struct(col("status"), col("cnt")))))
          .as("m"))
        .select(
          col("prio"),
          array_join(expr("transform(map_entries(m), e -> concat(e.key, ':', e.value))"), ",")
            .as("mu"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("total"))
        .orderBy("prio"),
    Some("""WITH kv AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status, count(*) AS cnt
        FROM orders GROUP BY 1, 2)
      SELECT prio,
        string_agg(status || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY status) AS mu,
        count(*) AS n_keys,
        CAST(sum(cnt) AS BIGINT) AS total
      FROM kv GROUP BY prio ORDER BY prio"""))

  /** Presto `numeric_histogram(b, v)` semantics — an EQUI-HEIGHT histogram
    * — in the scale-safe two-pass form: pass 1 computes the 7 inner
    * boundaries as EXACT interpolated percentiles (Spark's `percentile`
    * aggregate — partial-agg'd, no global sort; the naive ntile spelling
    * would funnel the whole table through ONE window partition, the
    * classic scale-killer), pass 2 assigns each row to
    * `1 + |{boundaries < v}|` against the BROADCAST boundary array and
    * folds per-bucket count/min/max. Boundaries round through the
    * decimal(24,6) device BEFORE assignment on BOTH engines, so a
    * boundary-straddling value cannot land in different buckets from
    * float noise. The oracle replays the same construction from DuckDB's
    * quantile_cont (the identical type-7 interpolation) — bucket counts,
    * membership, and edges all hash-compared. */
  private val aggEquiheight = Q(
    "q_agg_equiheight",
    (s, d) => {
      val o = t(s, d, "orders")
      val bounds = o.agg(
        expr("""transform(
            percentile(o_totalprice, array(0.125D,0.25D,0.375D,0.5D,0.625D,0.75D,0.875D)),
            b -> cast(round(cast(b as decimal(24,6)), 4) as double))""").as("bs"))
      o.crossJoin(broadcast(bounds))
        .select(col("o_totalprice"),
          (size(expr("filter(bs, b -> b < o_totalprice)")) + 1).cast("long").as("bucket"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          round(min("o_totalprice").cast("decimal(24,6)"), 2).cast("double").as("lo"),
          round(max("o_totalprice").cast("decimal(24,6)"), 2).cast("double").as("hi"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (
        SELECT list_transform(
            quantile_cont(o_totalprice, [0.125,0.25,0.375,0.5,0.625,0.75,0.875]),
            x -> CAST(round(CAST(x AS DECIMAL(24,6)), 4) AS DOUBLE)) AS bs
        FROM orders),
      assigned AS (
        SELECT o_totalprice,
          CAST(1 + len(list_filter(b.bs, x -> x < o_totalprice)) AS BIGINT) AS bucket
        FROM orders, b)
      SELECT bucket, count(*) AS n,
        CAST(round(CAST(min(o_totalprice) AS DECIMAL(24,6)), 2) AS DOUBLE) AS lo,
        CAST(round(CAST(max(o_totalprice) AS DECIMAL(24,6)), 2) AS DOUBLE) AS hi
      FROM assigned GROUP BY bucket ORDER BY bucket"""))

  /** Presto `geometric_mean` + `entropy` in one row. geometric_mean is
    * exp(avg(ln x)) — both engines spell it identically, so the only
    * divergence risk is partial-sum order on the doubles, absorbed by the
    * decimal round device. entropy: Presto's is Shannon entropy over a
    * count column; the Spark side computes it from FIRST PRINCIPLES as
    * H = log2(T) − (Σ c·log2 c)/T over the per-status counts (two
    * bounded aggregations, partial-agg'd, no window), while the oracle
    * calls DuckDB's NATIVE entropy() over the raw values — an
    * independent implementation, so agreement certifies the formula, not
    * a shared spelling. Scale shape: two low-cardinality hash aggregates. */
  private val aggEntropy = Q(
    "q_agg_entropy",
    (s, d) => {
      val o = t(s, d, "orders")
      val geo = o.groupBy("o_orderpriority")
        .agg(
          round(exp(avg(log(col("o_totalprice")))).cast("decimal(24,6)"), 2)
            .cast("double").as("geo_mean"),
          count(lit(1)).as("n"))
      val ent = o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).cast("double").as("c"))
        .groupBy("o_orderpriority")
        .agg(
          round((log2(sum("c")) - sum(col("c") * log2(col("c"))) / sum("c"))
            .cast("decimal(24,8)"), 6).cast("double").as("status_entropy"))
      geo.join(ent, "o_orderpriority").orderBy("o_orderpriority")
    },
    Some("""WITH g AS (
        SELECT o_orderpriority,
          CAST(round(CAST(exp(avg(ln(o_totalprice))) AS DECIMAL(24,6)), 2) AS DOUBLE)
            AS geo_mean,
          count(*) AS n,
          CAST(round(CAST(entropy(o_orderstatus) AS DECIMAL(24,8)), 6) AS DOUBLE)
            AS status_entropy
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, geo_mean, n, status_entropy
      FROM g ORDER BY o_orderpriority"""))

  /** Presto `reduce_agg(v, init, merge, combine)` — the generic fold
    * aggregate Spark has no spelling for. The idiomatic plan for a
    * commutative reduction is sorted-collect + the codegen'd `aggregate`
    * HOF: collecting in a CANONICAL order makes the float fold
    * deterministic (Presto itself only promises a deterministic result
    * for commutative/associative lambdas — this form strengthens that to
    * bit-reproducible), and the oracle replays the identical left fold
    * with DuckDB's list_reduce (whose seed is the FIRST ELEMENT, matched
    * here by folding `slice(seq, 2, n-1)` from `element_at(seq, 1)`).
    * The reduction is a compound product Π(1 + price/10^7) — the
    * portfolio-return shape a plain sum/avg cannot express. Bounded-group
    * contract like q_agg_listagg: the o_orderkey bound keeps per-group
    * collects bounded; an unbounded reduce_agg at corpus scale is
    * exactly q_agg_collect's documented bounded-before-collect problem. */
  private val aggReduce = Q(
    "q_agg_reduce",
    (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderpriority"),
          struct(col("o_orderkey"), (lit(1.0) + col("o_totalprice") / 1e7).as("term"))
            .as("kv"))
        .groupBy("o_orderpriority")
        .agg(array_sort(collect_list(col("kv"))).as("seq"))
        .select(
          col("o_orderpriority"),
          size(col("seq")).cast("long").as("n"),
          round(
            expr("""aggregate(
                transform(slice(seq, 2, size(seq) - 1), e -> e.term),
                element_at(seq, 1).term,
                (acc, x) -> acc * x)""").cast("decimal(24,10)"), 8)
            .cast("double").as("compound"))
        .orderBy("o_orderpriority"),
    Some("""WITH s AS (
        SELECT o_orderpriority,
          array_agg(1.0 + o_totalprice / 1e7 ORDER BY o_orderkey) AS vs
        FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderpriority)
      SELECT o_orderpriority, CAST(len(vs) AS BIGINT) AS n,
        CAST(round(CAST(list_reduce(vs, (a, x) -> a * x) AS DECIMAL(24,10)), 8) AS DOUBLE)
          AS compound
      FROM s ORDER BY o_orderpriority"""))

  // -- window functions --------------------------------------------------------

  private val windowTopkPerGroup = Q(
    "q_window_topk",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) sub
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  private val windowLagRunsum = Q(
    "q_window_lag",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
          round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("run_sum"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
        round(lag(o_totalprice) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
        round(sum(o_totalprice) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
      FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Ranking-function family. Two window specs on ONE partitioning so one
    * shuffle serves both sorts: rank/dense_rank/percent_rank rank a
    * NON-unique key (price buckets — real tie semantics, still
    * deterministic); lead/ntile need a total order (ties would make their
    * output physical-order-dependent) so they rank the unique twin. */
  private val windowRanks = Q(
    "q_window_ranks",
    (s, d) => {
      val bucket = floor(col("o_totalprice") / 50000).cast("long")
      val wTies = Window.partitionBy("o_orderpriority").orderBy(bucket)
      val wUniq = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          rank().over(wTies).cast("long").as("rnk"),
          dense_rank().over(wTies).cast("long").as("drnk"),
          round(percent_rank().over(wTies).cast("decimal(24,12)"), 6).cast("double").as("prank"),
          lead("o_orderkey", 1).over(wUniq).as("next_key"),
          ntile(4).over(wUniq).cast("long").as("quartile"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, rnk, drnk, prank, next_key, quartile FROM (
        SELECT o_orderpriority, o_orderkey,
          CAST(rank() OVER wt AS BIGINT) AS rnk,
          CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
          CAST(round(CAST(percent_rank() OVER wt AS DECIMAL(24,12)), 6) AS DOUBLE) AS prank,
          lead(o_orderkey) OVER wu AS next_key,
          CAST(ntile(4) OVER wu AS BIGINT) AS quartile
        FROM orders
        WINDOW wt AS (PARTITION BY o_orderpriority ORDER BY CAST(floor(o_totalprice / 50000) AS BIGINT)),
               wu AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)) sub
      ORDER BY o_orderpriority, o_orderkey"""))

  /** Distribution-window family completion (r10 verdict task 5): ntile +
    * nth_value rank the UNIQUE total order (ties would make their output
    * physical-order-dependent), percent_rank + cume_dist rank the
    * tie-bearing price-bucket ordering (real peer-group semantics, still
    * deterministic — every member of a peer group gets the same value).
    * nth_value reads an explicit full-partition ROWS frame so every row
    * sees the same 2nd-highest key (the default running frame would emit
    * NULL for row 1 — legal but a pointless asymmetry to hash). One
    * partitioning (o_orderpriority) serves all three specs, so Catalyst
    * plans a single exchange with per-spec sorts. */
  private val windowDist = Q(
    "q_window_dist",
    (s, d) => {
      val bucket = floor(col("o_totalprice") / 50000).cast("long")
      val wTies = Window.partitionBy("o_orderpriority").orderBy(bucket)
      val wUniq = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val wFull = wUniq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          ntile(5).over(wUniq).cast("long").as("pentile"),
          round(percent_rank().over(wTies).cast("decimal(24,12)"), 6).cast("double").as("prank"),
          round(cume_dist().over(wTies).cast("decimal(24,12)"), 6).cast("double").as("cdist"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, pentile, prank, cdist, second_key FROM (
        SELECT o_orderpriority, o_orderkey,
          CAST(ntile(5) OVER wu AS BIGINT) AS pentile,
          CAST(round(CAST(percent_rank() OVER wt AS DECIMAL(24,12)), 6) AS DOUBLE) AS prank,
          CAST(round(CAST(cume_dist() OVER wt AS DECIMAL(24,12)), 6) AS DOUBLE) AS cdist,
          nth_value(o_orderkey, 2) OVER wf AS second_key
        FROM orders
        WINDOW wt AS (PARTITION BY o_orderpriority ORDER BY CAST(floor(o_totalprice / 50000) AS BIGINT)),
               wu AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey),
               wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) sub
      ORDER BY o_orderpriority, o_orderkey"""))

  /** Bounded ROWS frames — the sliding-window shapes the other window
    * rows leave out: a trailing 3-row moving average, a centered
    * 1-before/1-after sum, and first/last_value over the full partition
    * (last_value needs the explicit UNBOUNDED FOLLOWING upper bound — the
    * default frame ends at CURRENT ROW and silently returns the current
    * row instead, in BOTH engines). ORDER BY o_orderkey is unique within
    * each partition, so the row frames are deterministic. One exchange on
    * o_orderpriority serves all four. */
  private val windowFrames = Q(
    "q_window_frames",
    (s, d) => {
      val base = Window.partitionBy("o_orderpriority").orderBy(col("o_orderkey"))
      val trail = base.rowsBetween(-2, Window.currentRow)
      val center = base.rowsBetween(-1, 1)
      val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          round(avg("o_totalprice").over(trail).cast("decimal(24,6)"), 2)
            .cast("double").as("trail_avg3"),
          round(sum("o_totalprice").over(center).cast("decimal(24,6)"), 2)
            .cast("double").as("center_sum3"),
          first("o_orderkey").over(full).as("first_key"),
          last("o_orderkey").over(full).as("last_key"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey,
        CAST(round(CAST(avg(o_totalprice) OVER wt AS DECIMAL(24,6)), 2) AS DOUBLE) AS trail_avg3,
        CAST(round(CAST(sum(o_totalprice) OVER wc AS DECIMAL(24,6)), 2) AS DOUBLE) AS center_sum3,
        first_value(o_orderkey) OVER wf AS first_key,
        last_value(o_orderkey) OVER wf AS last_key
      FROM orders
      WINDOW wt AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             wc AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING),
             wf AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderpriority, o_orderkey"""))

  /** RANGE frame (value-based, vs the ROWS frame in q_window_lag): peers
    * within 10000 price units backward contribute to the running aggregate. */
  private val windowRange = Q(
    "q_window_range",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
        .rangeBetween(-10000L, Window.currentRow)
      t(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_near"),
          round(sum("o_totalprice").over(w).cast("decimal(24,6)"), 2).cast("double").as("near_sum"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        count(*) OVER w AS n_near,
        CAST(round(CAST(sum(o_totalprice) OVER w AS DECIMAL(24,6)), 2) AS DOUBLE) AS near_sum
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  /** Window GROUPS frame mode — DOCUMENTED DEVIATION (the window twin of
    * the date_diff/date_add parser reservation, GraftExtensions.scala):
    * Presto supports `GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW`;
    * Spark's parser has no GROUPS mode at all (`ParseException` — pinned
    * in OperatorsSpec; DuckDB 1.0.0 rejects it too, "not implemented
    * yet"). The equivalent Spark plan is mechanical and exact: rank peer
    * groups with `dense_rank` over the same (partition, order) spec, then
    * aggregate over a RANGE frame on the rank — rows with rank in
    * [dr−k, dr] are precisely "the last k peer groups through the END of
    * the current row's group", which is what GROUPS CURRENT ROW means
    * (frame end = last peer). Because the local DuckDB cannot speak
    * native GROUPS either, the oracle derives the semantics from FIRST
    * PRINCIPLES instead of mirroring the rewrite: aggregate each peer
    * group to one row, take current + lag(previous) group totals, and
    * join back to rows — an independent construction, so agreement
    * actually certifies the rewrite. Scale shape: two window passes over
    * ONE exchange on the partition key (rank and frame share the
    * (o_orderpriority, sort) spec); sums fold integer keys so the
    * equality is bit-exact, no float rounding device needed. */
  private val windowGroups = Q(
    "q_window_groups",
    (s, d) => {
      val byDate = Window.partitionBy("o_orderpriority").orderBy(col("o_orderdate"))
      val grpFrame = Window.partitionBy("o_orderpriority").orderBy(col("dr"))
        .rangeBetween(-1, Window.currentRow)
      t(s, d, "orders")
        .withColumn("dr", dense_rank().over(byDate))
        .select(
          col("o_orderkey"), col("o_orderpriority"), col("dr"),
          sum("o_custkey").over(grpFrame).as("grp_sum"),
          count(lit(1)).over(grpFrame).as("grp_n"))
        // cast in a SEPARATE projection: casting dr in the same select the
        // frame references it would self-shadow (EngineSpec lint)
        .withColumn("dr", col("dr").cast("long"))
        .orderBy("o_orderkey")
    },
    Some("""WITH g AS (
        SELECT o_orderpriority, o_orderdate,
          CAST(sum(o_custkey) AS BIGINT) AS gsum, count(*) AS gn
        FROM orders GROUP BY o_orderpriority, o_orderdate),
      w AS (
        SELECT o_orderpriority, o_orderdate,
          CAST(dense_rank() OVER wo AS BIGINT) AS dr,
          CAST(gsum + COALESCE(lag(gsum) OVER wo, 0) AS BIGINT) AS grp_sum,
          gn + COALESCE(lag(gn) OVER wo, 0) AS grp_n
        FROM g
        WINDOW wo AS (PARTITION BY o_orderpriority ORDER BY o_orderdate))
      SELECT o.o_orderkey, o.o_orderpriority, w.dr, w.grp_sum, w.grp_n
      FROM orders o
      JOIN w ON o.o_orderpriority = w.o_orderpriority
            AND o.o_orderdate = w.o_orderdate
      ORDER BY o.o_orderkey"""))

  /** Window frame EXCLUDE clause — DOCUMENTED DEVIATION #3 (r13 verdict
    * missing #3; the third parser gap beside date_diff units and GROUPS):
    * Presto and DuckDB accept `ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
    * EXCLUDE CURRENT ROW`; Spark 4's parser has no EXCLUDE clause at all
    * (ParseException — pinned in OperatorsSpec). The mechanical rewrite is
    * exact for EXCLUDE CURRENT ROW: aggregate over the FULL frame, then
    * subtract the current row's contribution (sum − x, count − 1); when
    * the excluded frame is EMPTY (a 1-row partition) the standard demands
    * NULL where the subtraction would yield 0, so both aggregates guard on
    * the excluded count. The oracle runs DuckDB's NATIVE EXCLUDE CURRENT
    * ROW — agreement certifies the rewrite against an independent
    * implementation, the q_window_groups standing. Integer sums keep the
    * equality bit-exact; the avg replays the round-decimal device. One
    * exchange on the partition key serves all three outputs. */
  private val windowExclude = Q(
    "q_window_exclude",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_orderkey"))
        .rowsBetween(-2, 2)
      t(s, d, "orders")
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          (sum("o_custkey").over(w) - col("o_custkey")).cast("long").as("x_sum"),
          (count(lit(1)).over(w) - 1).cast("long").as("x_n"))
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          when(col("x_n") > 0, col("x_sum")).as("excl_sum"),
          col("x_n").as("excl_n"),
          when(col("x_n") > 0,
            round((col("x_sum").cast("double") / col("x_n")).cast("decimal(24,6)"), 2)
              .cast("double")).as("excl_avg"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority,
        CAST(sum(o_custkey) OVER w AS BIGINT) AS excl_sum,
        CAST(count(*) OVER w AS BIGINT) AS excl_n,
        CAST(round(CAST(CAST(sum(o_custkey) OVER w AS DOUBLE)
                        / (count(*) OVER w) AS DECIMAL(24,6)), 2) AS DOUBLE) AS excl_avg
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW)
      ORDER BY o_orderkey"""))

  /** The FULL frame-EXCLUDE mode matrix (closes deviation #3 beyond
    * q_window_exclude's CURRENT ROW case): Presto/DuckDB's `EXCLUDE GROUP /
    * TIES / NO OTHERS` on a VALUE-RANGE frame. On a RANGE frame the whole
    * peer group of the current row lies inside the frame by construction
    * (peers share the ORDER BY value), so the rewrites are exact algebra
    * over two window passes sharing ONE exchange on the partition key:
    *
    *   frame aggregates   sum/count over (part ORDER BY v RANGE k PRECEDING..CURRENT)
    *   peer aggregates    sum/count over (part, v) — the unordered peer window
    *   EXCLUDE GROUP      frame_sum − peer_sum     (NULL when frame == peers)
    *   EXCLUDE TIES       frame_sum − peer_sum + x (current row stays)
    *   EXCLUDE CURRENT    frame_sum − x            (NULL when frame == {row}:
    *                      a row alone in its peer group with no partition
    *                      rows within RANGE 2 PRECEDING has exactly that
    *                      frame, so the guard is required — whether it fires
    *                      is data-dependent on ORDER-BY-value density, and
    *                      an unguarded subtraction would yield 0 where the
    *                      native spelling yields NULL; r14 ADVICE)
    *   EXCLUDE NO OTHERS  frame_sum                (the default, declared to
    *                      pin that the matrix is mutually consistent)
    *
    * This decomposition is NOT valid for ROWS frames (a peer can fall
    * outside a row-counted frame) — the scaladoc on q_window_exclude's
    * deviation note says exactly that, and this row is the RANGE-side
    * proof. dayofmonth as the ORDER BY value makes peer groups large, so
    * GROUP/TIES genuinely differ from CURRENT ROW everywhere. The oracle
    * runs DuckDB's NATIVE four EXCLUDE spellings — four independent
    * implementations against four rewrites in one row. */
  private val windowExcludeModes = Q(
    "q_window_exclude_modes",
    (s, d) => {
      val frame = Window.partitionBy("o_orderpriority").orderBy(col("v"))
        .rangeBetween(-2, Window.currentRow)
      // the peer set IS the zero-width RANGE frame — spelled on the SAME
      // (partition, order) spec as `frame` so both windows ride one
      // exchange + one sort (a partitionBy(prio, v) spelling would add a
      // second hash exchange for the identical peer aggregates)
      val peers = Window.partitionBy("o_orderpriority").orderBy(col("v"))
        .rangeBetween(Window.currentRow, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"),
          dayofmonth(col("o_orderdate")).cast("long").as("v"))
        .select(
          col("o_orderkey"), col("o_orderpriority"), col("v"),
          sum("o_custkey").over(frame).as("f_sum"),
          count(lit(1)).over(frame).as("f_n"),
          sum("o_custkey").over(peers).as("p_sum"),
          count(lit(1)).over(peers).as("p_n"),
          col("o_custkey"))
        .select(
          col("o_orderkey"), col("o_orderpriority"), col("v"),
          when(col("f_n") > col("p_n"), col("f_sum") - col("p_sum"))
            .as("excl_group"),
          (col("f_sum") - col("p_sum") + col("o_custkey")).as("excl_ties"),
          when(col("f_n") > 1, col("f_sum") - col("o_custkey"))
            .as("excl_current"),
          col("f_sum").as("excl_none"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority, CAST(v AS BIGINT) AS v,
        CAST(sum(o_custkey) OVER wg AS BIGINT) AS excl_group,
        CAST(sum(o_custkey) OVER wt AS BIGINT) AS excl_ties,
        CAST(sum(o_custkey) OVER wc AS BIGINT) AS excl_current,
        CAST(sum(o_custkey) OVER wn AS BIGINT) AS excl_none
      FROM (SELECT o_orderkey, o_orderpriority, o_custkey,
                   dayofmonth(o_orderdate) AS v FROM orders)
      WINDOW
        wg AS (PARTITION BY o_orderpriority ORDER BY v
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE GROUP),
        wt AS (PARTITION BY o_orderpriority ORDER BY v
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE TIES),
        wc AS (PARTITION BY o_orderpriority ORDER BY v
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW),
        wn AS (PARTITION BY o_orderpriority ORDER BY v
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE NO OTHERS)
      ORDER BY o_orderkey"""))

  // -- sort / limit / top-k ----------------------------------------------------

  /** Global top-k: Catalyst plans TakeOrderedAndProject — per-partition heap
    * + driver merge of k rows, no full sort at any scale. */
  private val sortTopk = Q(
    "q_sort_topk",
    (s, d) =>
      t(s, d, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** Multi-key sort with explicit NULLS ordering + OFFSET pagination
    * (lag introduces genuine nulls; both engines agree on NULLS LAST). */
  private val sortNullsOffset = Q(
    "q_sort_nulls_offset",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"))
        .orderBy(desc_nulls_last("prev_price"), asc("o_orderkey"))
        .offset(10)
        .limit(50)
    },
    Some("""SELECT o_custkey, o_orderkey, prev_price FROM (
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price
        FROM orders) sub
      ORDER BY prev_price DESC NULLS LAST, o_orderkey
      LIMIT 50 OFFSET 10"""))

  // -- set operations ----------------------------------------------------------

  private val setUnion = Q(
    "q_set_union",
    (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.filter(col("c_acctbal") > 9000).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000) sub
      ORDER BY c_custkey"""))

  private val setUnionAll = Q(
    "q_set_union_all",
    (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.filter(col("c_acctbal") > 9000).select("c_custkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n")) // counts expose the ALL semantics
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000) sub
      GROUP BY c_custkey ORDER BY c_custkey"""))

  private val setIntersect = Q(
    "q_set_intersect",
    (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 5000).select("c_custkey")
        .intersect(c.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY') sub
      ORDER BY c_custkey"""))

  private val setExcept = Q(
    "q_set_except",
    (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 5000).select("c_custkey")
        .except(c.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY') sub
      ORDER BY c_custkey"""))

  /** INTERSECT ALL — the multiset intersection Presto supports and the
    * DISTINCT form can't express (`README.md:116` "any valid Presto SQL"):
    * each o_custkey appears min(multiplicity_left, multiplicity_right)
    * times. Same scale shape as the DISTINCT form: Catalyst rewrites
    * bag-intersect to an aggregate + join on the value (one shuffle on
    * the key), never a sort of either side. */
  private val setIntersectAll = Q(
    "q_set_intersect_all",
    (s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersectAll(o.filter(col("o_totalprice") > 100000).select("o_custkey"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 100000) sub
      ORDER BY o_custkey"""))

  /** EXCEPT ALL — multiset difference: each o_custkey keeps
    * max(0, multiplicity_left − multiplicity_right) copies. */
  private val setExceptAll = Q(
    "q_set_except_all",
    (s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .exceptAll(o.filter(col("o_totalprice") > 100000).select("o_custkey"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 100000) sub
      ORDER BY o_custkey"""))

  /** approx_percentile — the workhorse Presto percentile in practice
    * (exact percentile sorts every group; the sketch is the 100 TB path).
    * Sketch estimates differ across engines (Spark: Greenwald-Khanna,
    * DuckDB: t-digest), so like `q_agg_approx_distinct` the declared check
    * is the CONTRACT, not the estimate: each engine's own approximate
    * percentile must land inside the exact [p−0.02, p+0.02] quantile band
    * (GK at accuracy 10000 guarantees rank error ≤ n/10000 ≪ 0.02n; the
    * t-digest's median-region error is an order below the band), plus the
    * exact median hash-anchored through the decimal-round device the exact
    * twin `q_agg_percentile` uses. */
  private val aggApproxPercentile = Q(
    "q_agg_approx_percentile",
    (s, d) =>
      t(s, d, "orders")
        // array-percentile form: ONE exact-percentile aggregate computes
        // all five band quantiles from a single per-group value map, and
        // one GK sketch serves both probes — 4x fewer aggregate buffers
        // than per-quantile calls (bench: 2.4 s -> the q_agg_percentile
        // envelope)
        .agg(
          percentile(col("o_totalprice"),
            array(lit(0.48), lit(0.5), lit(0.52), lit(0.88), lit(0.9), lit(0.92)))
            .as("ex"),
          percentile_approx(col("o_totalprice"), array(lit(0.5), lit(0.9)), lit(10000))
            .as("ap"))
        .select(
          round(element_at(col("ex"), 2).cast("decimal(24,6)"), 2)
            .cast("double").as("exact_median"),
          (element_at(col("ap"), 1) >= element_at(col("ex"), 1) &&
            element_at(col("ap"), 1) <= element_at(col("ex"), 3)).as("p50_in_band"),
          (element_at(col("ap"), 2) >= element_at(col("ex"), 4) &&
            element_at(col("ap"), 2) <= element_at(col("ex"), 6)).as("p90_in_band")),
    Some("""SELECT
        CAST(round(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(24,6)), 2) AS DOUBLE)
          AS exact_median,
        approx_quantile(o_totalprice, 0.5)
          BETWEEN quantile_cont(o_totalprice, 0.48) AND quantile_cont(o_totalprice, 0.52)
          AS p50_in_band,
        approx_quantile(o_totalprice, 0.9)
          BETWEEN quantile_cont(o_totalprice, 0.88) AND quantile_cont(o_totalprice, 0.92)
          AS p90_in_band
      FROM orders"""))

  /** array_agg — the Presto collection aggregate. Collection order is
    * nondeterministic in BOTH engines (partial aggregation), so the
    * declared form is the deterministic one a correct query must use
    * anyway: the 20 smallest values per group, sorted. Scale shape: the
    * BOUND is applied BEFORE any collection — a per-group row_number
    * keeps 20 rows per group, and only those reach collect_list, so no
    * aggregation buffer ever holds an unbounded array (collect-then-slice
    * is the 100 TB memory anti-pattern: with 5 priority groups, a whole
    * corpus lands in 5 buffers). The window and the aggregate share ONE
    * exchange on the group key (plan-pinned). Ties among equal o_custkey
    * values make row identity arbitrary but the kept multiset exact.
    * The collected array is serialized with array_join — declared outputs
    * must be scalar-typed so the cross-engine sort+hash gate can consume
    * them (same convention as q_array_fns). */
  private val aggCollect = Q(
    "q_agg_collect",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority").orderBy("o_custkey")
      val wAll = Window.partitionBy("o_orderpriority")
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_custkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") <= 20)
        .groupBy("o_orderpriority")
        .agg(
          array_join(sort_array(collect_list(col("o_custkey"))), ",")
            .as("first_custs"),
          max("n").as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
        array_to_string(list_sort(list(o_custkey))[1:20], ',') AS first_custs,
        count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** histogram / map_agg — Presto's value→count map aggregate, declared in
    * entry-list form ("status:count" strings, sorted) because map-typed
    * columns have no canonical cross-engine ordering to hash. Two-level
    * aggregate: the inner count is map-side combinable, the outer collect
    * is |statuses|-bounded per group. */
  private val aggHistogram = Q(
    "q_agg_histogram",
    (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .select(col("o_orderpriority"),
          concat_ws(":", col("o_orderstatus"), col("cnt")).as("e"))
        .groupBy("o_orderpriority")
        .agg(array_join(sort_array(collect_list(col("e"))), ",").as("histogram"))
        .orderBy("o_orderpriority"),
    Some("""WITH c AS (
        SELECT o_orderpriority, o_orderstatus || ':' || CAST(count(*) AS VARCHAR) AS e
        FROM orders GROUP BY o_orderpriority, o_orderstatus)
      SELECT o_orderpriority, array_to_string(list_sort(list(e)), ',') AS histogram
      FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Error-safe function family — Presto's `TRY(...)` idiom, the construct
    * an Athena security-log user leans on constantly for dirty data
    * (`README.md:116` "any valid Presto SQL"): failed casts and zero
    * divisions yield NULL instead of failing the query. Spark spells it
    * try_cast / try_divide (ANSI mode makes the non-try forms THROW, so
    * the try family is the only sanctioned dirty-data path); DuckDB
    * mirrors with TRY_CAST and an explicit zero guard. */
  private val tryFns = Q(
    "q_try_fns",
    (s, d) => {
      // tryFast = exception-free twin of the TRY-mode string→integral cast
      // (r19): Spark's own try_cast still parses via the THROWING
      // toLongExact, so bad_cast paid exception construction on EVERY row
      // ("1-URGENT" never parses). Same results by the fuzz-rig pin in
      // FunctionsSpec + the oracle hash; the try_cast spelling stays.
      val fastE = graft.functions.ErrorSafeFunctions.tryFast _
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          fastE(expr("try_cast(o_orderpriority as int)")).as("bad_cast"),
          fastE(expr("try_cast(substr(o_orderpriority, 1, 1) as bigint)")).as("prio_num"),
          expr("try_cast(o_orderstatus as timestamp)").cast("string").as("bad_ts"),
          expr("""round(cast(try_divide(o_totalprice, o_custkey % 3) as decimal(24,6)), 2)
                  """).cast("double").as("safe_div"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
        TRY_CAST(o_orderpriority AS INT) AS bad_cast,
        TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
        CAST(TRY_CAST(o_orderstatus AS TIMESTAMP) AS VARCHAR) AS bad_ts,
        CAST(round(CAST(CASE WHEN o_custkey % 3 = 0 THEN NULL
                             ELSE o_totalprice / (o_custkey % 3) END AS DECIMAL(24,6)), 2)
             AS DOUBLE) AS safe_div
      FROM orders ORDER BY o_orderkey"""))

  /** Presto's generic `TRY(expr)` wrapper through the node the registered
    * `try(...)` spelling lowers onto ([[graft.functions.ErrorSafeFunctions]]
    * / TryEval — r16 verdict missing #3; q_try_fns covers the try_cast/
    * try_divide spellings). Under ANSI mode every wrapped error class is
    * REAL here: the bad numeric cast throws (→ NULL), json_parse throws on
    * the malformed half of the docs (→ NULL, valid half canonicalizes),
    * and the modulo-3 division by zero throws (→ NULL) — each column
    * carries both outcomes so TRY is load-bearing in the hash. The oracle
    * (DuckDB 1.0 has no generic TRY) reconstructs each NULL-condition
    * explicitly. Pure projection, no exchange beyond the sort. */
  private val tryPresto = Q(
    "q_try_presto",
    (s, d) => {
      val tryE = graft.functions.ErrorSafeFunctions.tryEval _
      t(s, d, "orders")
        .withColumn("doc",
          when(col("o_orderkey") % 2 === 0,
            concat(lit("""{ "a" : """), col("o_custkey").cast("string"), lit(" }")))
            .otherwise(lit("{broken")))
        .select(
          col("o_orderkey"),
          tryE(expr("cast(o_orderpriority AS int)")).as("bad_cast"),
          tryE(expr("cast(substr(o_orderpriority, 1, 1) AS int)")).as("prio_num"),
          tryE(graft.functions.PrestoJsonFunctions.jsonParse(col("doc"))).as("canon"),
          tryE(expr("""round(cast(o_totalprice / (o_custkey % 3) AS decimal(24,6)), 2)"""))
            .cast("double").as("safe_div"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
        CAST(NULL AS INT) AS bad_cast,
        CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
        CASE WHEN o_orderkey % 2 = 0
             THEN json('{ "a" : ' || o_custkey || ' }')::VARCHAR END AS canon,
        CAST(CASE WHEN o_custkey % 3 = 0 THEN NULL
                  ELSE round(CAST(o_totalprice / (o_custkey % 3) AS DECIMAL(24,6)), 2)
             END AS DOUBLE) AS safe_div
      FROM orders ORDER BY o_orderkey"""))

  /** URL extraction — Presto's url_extract_host/path/query/parameter
    * family, the Athena staple for CloudFront/WAF/proxy security logs
    * (the reference's domain). Spark spells them all through one codegen'd
    * `parse_url`; the oracle extracts the same components with independent
    * regexes, so Spark's parser is checked against a second
    * implementation, not an echo. URLs are built from customer columns
    * (the synthetic tables carry no URL column), identically on both
    * engines. */
  private val urlFns = Q(
    "q_string_url",
    (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          concat(lit("https://node"), col("c_nationkey"),
            lit(".example.com/seg/"), col("c_mktsegment"),
            lit("?n="), col("c_nationkey"), lit("&k="), col("c_custkey")).as("url"))
        .select(col("c_custkey"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'n')").as("n_param"))
        .orderBy("c_custkey"),
    Some("""WITH u AS (
        SELECT c_custkey,
               'https://node' || c_nationkey || '.example.com/seg/' || c_mktsegment
                 || '?n=' || c_nationkey || '&k=' || c_custkey AS url
        FROM customer)
      SELECT c_custkey, url,
        regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        regexp_extract(url, '\?([^#]*)', 1) AS query,
        regexp_extract(url, '[?&]n=([^&#]*)', 1) AS n_param
      FROM u ORDER BY c_custkey"""))

  /** Presto's url_extract_* SPELLINGS (r14 verdict missing #2 —
    * q_string_url covers the semantics through parse_url; this row lands
    * beside the GraftExtensions registrations of url_extract_host/path/
    * query/parameter/protocol/fragment so a pasted Athena query resolves
    * verbatim; EngineSpec pins each SQL spelling == its parse_url
    * lowering). Runs over the documents corpus (URLs constructed from
    * source/lang/doc_id — the synthetic tables carry no URL column) and
    * exercises the edges q_string_url doesn't: PROTOCOL, the #fragment
    * (REF), and a MISSING query parameter, where parse_url returns NULL —
    * the oracle regexes return NULL through an explicit CASE, so the two
    * engines' miss conventions are aligned by construction rather than by
    * luck. Narrow projection, no exchange; the declared form uses
    * parse_url directly (injected spellings are invisible to plain
    * driver sessions — the lowering is identity). */
  private val urlExtract = Q(
    "q_string_url_extract",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("https://cdn-"), col("source"), lit(".example.org/docs/"),
            col("lang"), lit("/"), col("doc_id"), lit("?lang="), col("lang"),
            when(col("doc_id") % 3 === 0, concat(lit("&trk=t"), col("doc_id") % 5))
              .otherwise(lit("")),
            lit("#p"), col("doc_id") % 7).as("url"))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'PROTOCOL')").as("proto"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"),
          expr("parse_url(url, 'QUERY', 'trk')").as("trk_param"),
          expr("parse_url(url, 'REF')").as("fragment"))
        .orderBy("doc_id"),
    Some("""WITH u AS (
        SELECT doc_id,
               'https://cdn-' || source || '.example.org/docs/' || lang || '/'
                 || doc_id || '?lang=' || lang
                 || CASE WHEN doc_id % 3 = 0 THEN '&trk=t' || (doc_id % 5) ELSE '' END
                 || '#p' || (doc_id % 7) AS url
        FROM documents)
      SELECT doc_id, url,
        regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        regexp_extract(url, '\?([^#]*)', 1) AS query,
        regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
        CASE WHEN url LIKE '%trk=%'
             THEN regexp_extract(url, '[?&]trk=([^&#]*)', 1) END AS trk_param,
        regexp_extract(url, '#(.*)$', 1) AS fragment
      FROM u ORDER BY doc_id"""))

  /** Presto strpos/split_part/levenshtein_distance/format/split_to_map
    * edges (r14 verdict missing #4's split_part half + the alias sweep's
    * string spellings, each registered in GraftExtensions; the declared
    * forms below are the native/Column lowerings so a plain driver session
    * runs them). The load-bearing edges: strpos with an INSTANCE argument
    * (incl. negative = count from the end — the codegen'd StrPosInstance),
    * split_part with negative and OVERSIZE indexes (both engines return ''
    * out of range, '' handled identically), and printf-style format. The
    * oracle replays the nth-occurrence position with DuckDB's split/rejoin
    * identity (prefix length before the nth delimiter occurrence), an
    * independent construction of the same semantics. Narrow projection,
    * no exchange. */
  private val stringStrpos = Q(
    "q_string_strpos",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          instr(col("p_name"), "d").cast("long").as("pos1"),
          graft.functions.TextFunctions.strposInstance(col("p_name"), lit("d"), 2)
            .cast("long").as("pos2"),
          graft.functions.TextFunctions.strposInstance(col("p_name"), lit("d"), -1)
            .cast("long").as("pos_last"),
          instr(col("p_name"), "zz").cast("long").as("pos_miss"),
          split_part(col("p_name"), lit(" "), lit(2)).as("sp2"),
          split_part(col("p_name"), lit(" "), lit(-2)).as("spneg"),
          split_part(col("p_name"), lit(" "), lit(5)).as("spover"),
          levenshtein(col("p_name"), col("p_type")).cast("long").as("lev"),
          format_string("%s#%d", col("p_brand"), col("p_partkey")).as("fmt"),
          element_at(
            str_to_map(concat(lit("brand="), col("p_brand"), lit("&type="), col("p_type")),
              lit("&"), lit("=")),
            lit("type")).as("type_v"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        CAST(strpos(p_name, 'd') AS BIGINT) AS pos1,
        CAST(CASE WHEN len(string_split(p_name, 'd')) > 2
             THEN length(array_to_string(list_slice(string_split(p_name, 'd'), 1, 2), 'd')) + 1
             ELSE 0 END AS BIGINT) AS pos2,
        CAST(CASE WHEN len(string_split(p_name, 'd')) >= 2
             THEN length(array_to_string(list_slice(string_split(p_name, 'd'), 1,
                    len(string_split(p_name, 'd')) - 1), 'd')) + 1
             ELSE 0 END AS BIGINT) AS pos_last,
        CAST(strpos(p_name, 'zz') AS BIGINT) AS pos_miss,
        split_part(p_name, ' ', 2) AS sp2,
        split_part(p_name, ' ', -2) AS spneg,
        split_part(p_name, ' ', 5) AS spover,
        CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev,
        printf('%s#%d', p_brand, p_partkey) AS fmt,
        p_type AS type_v
      FROM part ORDER BY p_partkey"""))

  /** Presto ISO-calendar + epoch spellings (day_of_week ISO Monday=1,
    * day_of_year, year_of_week — the ISO WEEK-NUMBERING year, which
    * differs from year() around Jan 1 — to_unixtime as DOUBLE seconds,
    * to_iso8601, from_iso8601_date; all registered as SQL spellings in
    * GraftExtensions, declared here through their native lowerings).
    * The Jan-1 rows in the orders corpus are the interesting ones:
    * iso_year != year exactly when the week belongs to the prior ISO
    * year, and the oracle's isoyear() is DuckDB's own independent ISO
    * implementation. Narrow projection, no exchange. */
  private val datePrestoIso = Q(
    "q_date_presto_iso",
    (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          expr("extract(YEAROFWEEK FROM o_orderdate)").cast("long").as("iso_year"),
          col("o_orderdate").cast("timestamp").cast("double").as("epoch_d"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("iso_ts"),
          date_format(date_format(col("o_orderdate"), "yyyy-MM-dd").cast("date"),
            "yyyy-MM-dd").as("iso_date_rt"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
        CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
        CAST(epoch(o_orderdate) AS DOUBLE) AS epoch_d,
        strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%g') AS iso_ts,
        strftime(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE), '%Y-%m-%d') AS iso_date_rt
      FROM orders ORDER BY o_orderkey"""))

  /** The from_unixtime TYPE-divergence row (r15 verdict missing #2):
    * Presto's from_unixtime(double) returns TIMESTAMP where Spark's
    * same-named built-in returns a session-tz STRING — the one dialect
    * divergence that neither fails loudly nor matches silently-identical.
    * The Presto semantics are declared through the non-shadowing
    * `presto_from_unixtime` lowering (`timestamp_seconds` — fractional
    * seconds kept; deviation note + EngineSpec pin beside the
    * registration), formatted to text per the no-raw-timestamp contract;
    * Spark's native string-returning form rides along so the row hashes
    * BOTH sides of the divergence. Narrow projection, no exchange. */
  private val dateFromUnixtime = Q(
    "q_date_from_unixtime",
    (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          date_format(timestamp_seconds(col("o_orderkey").cast("double") + lit(0.25d)),
            "yyyy-MM-dd HH:mm:ss.SSS").as("presto_ts"),
          from_unixtime(col("o_orderkey")).as("spark_str"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        strftime(to_timestamp(o_orderkey + 0.25), '%Y-%m-%d %H:%M:%S.%g') AS presto_ts,
        strftime(to_timestamp(o_orderkey), '%Y-%m-%d %H:%M:%S') AS spark_str
      FROM orders ORDER BY o_orderkey"""))

  /** The two SILENT split/extract dialect traps, through their
    * non-shadowing lowerings (deviations #11/#12, README table): Presto's
    * split treats the delimiter as a LITERAL (Spark's as a REGEX — a
    * pasted split(col, '.') silently shatters every row), and Presto's
    * 2-arg regexp_extract returns the WHOLE match (Spark's defaults to
    * group 1). The '.' delimiter and a two-group pattern make both traps
    * load-bearing in the hash: the regex reading of '.' would produce
    * empty parts, and the group-1 reading would drop the '-URGENT' tail.
    * DuckDB is a third implementation agreeing with Presto on both
    * defaults (string_split literal, regexp_extract group 0). Pure
    * projection, no exchange. */
  private val prestoSplitRow = Q(
    "q_string_presto_split",
    (s, d) =>
      t(s, d, "orders")
        .withColumn("doc",
          concat_ws(".", col("o_orderstatus"), col("o_orderpriority"),
            col("o_custkey").cast("string")))
        .select(
          col("o_orderkey"),
          array_join(graft.functions.PrestoStringFunctions
            .prestoSplit(col("doc"), lit(".")), "/").as("parts"),
          size(graft.functions.PrestoStringFunctions
            .prestoSplit(col("doc"), lit("."))).cast("long").as("n_parts"),
          graft.functions.PrestoStringFunctions
            .prestoRegexpExtract(col("o_orderpriority"), lit("([0-9]+)-([A-Z]+)"))
            .as("whole_match"),
          // the _all form carries the SAME default-group trap (r18):
          // Spark's 2-arg regexp_extract_all returns group 1 per match —
          // here that would strip '-URGENT' from every match. The pattern
          // matches every doc (one digits-dash-letters run per priority),
          // so the engines' differing no-match conventions (Spark [] vs
          // DuckDB NULL) stay out of play; the coalesce guards any corpus
          // where they would not
          coalesce(array_join(graft.functions.PrestoStringFunctions
            .prestoRegexpExtractAll(col("doc"), lit("([0-9]+)-([A-Z]+)")), "/"), lit(""))
            .as("whole_matches"))
        .orderBy("o_orderkey"),
    Some("""WITH d AS (SELECT o_orderkey, o_orderpriority,
               o_orderstatus || '.' || o_orderpriority || '.' || CAST(o_custkey AS VARCHAR) AS doc
             FROM orders)
      SELECT o_orderkey,
        array_to_string(string_split(doc, '.'), '/') AS parts,
        CAST(len(string_split(doc, '.')) AS BIGINT) AS n_parts,
        regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)') AS whole_match,
        coalesce(array_to_string(regexp_extract_all(doc, '([0-9]+)-([A-Z]+)'), '/'), '') AS whole_matches
      FROM d ORDER BY o_orderkey"""))

  /** Presto `ngrams(arr, n)` — the shingle builder a migrating text-dedup
    * pipeline types before MinHash (the registered lowering composes
    * codegen'd slice/transform/sequence; GraftExtensions — the pasted SQL
    * spelling is pinned in EngineSpec on an extensions session, and this
    * row runs the identical expression through the Column wrapper on the
    * vanilla Verify session). The oracle reconstructs n-grams with
    * DuckDB's generate_series + INCLUSIVE list_slice — an independent
    * formulation; the greatest() guard mirrors the short-input contract
    * (size < n → one n-gram: the whole array) on both engines. Narrow
    * projection, no exchange beyond the presentation sort. */
  private val stringNgrams = Q(
    "q_string_ngrams",
    (s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") % 37 === 0)
        .select(
          col("doc_id"),
          array_join(
            transform(
              graft.functions.PrestoArrayFunctions.ngrams(split(col("text"), " "), 3),
              g => array_join(g, " ")), "|").as("trigrams"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
        array_to_string(list_transform(
          generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
          i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')),
          '|') AS trigrams
      FROM documents WHERE doc_id % 37 = 0 ORDER BY doc_id"""))

  /** Presto `regexp_split` (r15 verdict missing #4) — declared through its
    * native lowering split(s, pattern, -1), whose -1 limit PRESERVES
    * trailing empty strings exactly as Presto does (and as DuckDB's
    * string_split_regex does — the oracle is a genuine third
    * implementation of the same contract). Output flattened to atomic
    * columns: the joined parts, the count, and the trailing-empty witness
    * (names ending in a vowel produce one). Narrow projection, no
    * exchange. */
  private val regexpSplit = Q(
    "q_string_regexp_split",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          array_join(split(col("p_name"), "[aeiou]+", -1), "|").as("parts"),
          size(split(col("p_name"), "[aeiou]+", -1)).cast("long").as("n_parts"),
          (element_at(split(col("p_name"), "[aeiou]+", -1), -1) === "").as("trail_empty"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        array_to_string(string_split_regex(p_name, '[aeiou]+'), '|') AS parts,
        CAST(len(string_split_regex(p_name, '[aeiou]+')) AS BIGINT) AS n_parts,
        string_split_regex(p_name, '[aeiou]+')[-1] = '' AS trail_empty
      FROM part ORDER BY p_partkey"""))

  /** Presto `approx_distinct` (r15 verdict missing #4) — declared through
    * its native lowering approx_count_distinct(x, 0.023) (both are HLL++;
    * 0.023 is Presto's default standard error, pinned by the
    * registration). Like q_agg_approx_distinct, the cross-engine check is
    * the estimator's CONTRACT (within 5% of exact — sketches differ
    * between engines), plus the exact count itself. One partial-agg
    * exchange. */
  private val aggApproxPresto = Q(
    "q_agg_approx_presto",
    (s, d) =>
      t(s, d, "orders")
        .agg(
          countDistinct("o_custkey").as("exact_custs"),
          approx_count_distinct(col("o_custkey"), 0.023).as("approx_raw"))
        .select(
          col("exact_custs"),
          (abs(col("approx_raw") - col("exact_custs")) <
            col("exact_custs") * 0.05).as("within_5pct")),
    Some("""SELECT count(DISTINCT o_custkey) AS exact_custs,
        abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
          < count(DISTINCT o_custkey) * 0.05 AS within_5pct
      FROM orders"""))

  /** Presto binary-encoding spellings: to_hex/from_hex, to_base64/
    * from_base64, to_utf8/from_utf8 (registered in GraftExtensions; the
    * declared forms are the native hex/unhex/base64/unbase64/encode/decode
    * lowerings). Each pair round-trips through its inverse so BOTH
    * directions are in the hash — the oracle computes the forward
    * direction with DuckDB's own hex/to_base64 and pins the round trip to
    * the identity. Byte length via octet_length keeps the UTF-8-bytes
    * (not chars) contract of to_utf8 in the row. Narrow projection, no
    * exchange. */
  private val encodingPresto = Q(
    "q_encoding_presto",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          hex(encode(col("p_name"), "UTF-8")).as("hx"),
          decode(unhex(hex(encode(col("p_name"), "UTF-8"))), "UTF-8").as("hx_rt"),
          base64(encode(col("p_name"), "UTF-8")).as("b64"),
          decode(unbase64(base64(encode(col("p_name"), "UTF-8"))), "UTF-8").as("b64_rt"),
          length(encode(col("p_name"), "UTF-8")).cast("long").as("n_bytes"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        hex(p_name) AS hx,
        p_name AS hx_rt,
        to_base64(p_name::BLOB) AS b64,
        p_name AS b64_rt,
        CAST(octet_length(p_name::BLOB) AS BIGINT) AS n_bytes
      FROM part ORDER BY p_partkey"""))

  /** Presto numeric-classification + misc-aggregate spellings: truncate
    * (toward zero — declared as its x - x%1 lowering, exact for doubles),
    * is_nan / is_infinite / is_finite over a column with PLANTED NaN and
    * +/-Infinity rows (the classification trio is pointless on a corpus
    * that never produces specials), plus bitwise_and_agg/bitwise_or_agg
    * (bit_and/bit_or lowerings) and arbitrary (any_value — made
    * deterministic by aggregating the GROUP KEY, the only value any_value
    * can return). checksum() is registered too but deliberately NOT in
    * this row: its digest convention is engine-internal (documented
    * deviation in GraftExtensions), so its contract — order-insensitivity
    * — is pinned in EngineSpec instead of hash-compared cross-engine.
    * One partial-aggregate exchange. */
  private val mathPresto = Q(
    "q_math_presto",
    (s, d) => {
      val k = col("c_custkey") % 7
      val v = when(k === 0, lit(Double.NaN))
        .when(k === 1, lit(Double.PositiveInfinity))
        .when(k === 2, lit(Double.NegativeInfinity))
        .otherwise(col("c_acctbal") - lit(4500.0d))
      val isInf = abs(col("v")) === lit(Double.PositiveInfinity)
      val isFinite = !isnan(col("v")) && !isInf
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), v.as("v"))
        .groupBy(col("c_nationkey").cast("long").as("nation"))
        .agg(
          count(when(isnan(col("v")), 1)).as("n_nan"),
          count(when(isInf, 1)).as("n_inf"),
          count(when(isFinite, 1)).as("n_finite"),
          sum(when(isFinite, col("v") - (col("v") % lit(1.0d)))).as("sum_trunc"),
          expr("bit_and(c_custkey)").as("ba"),
          expr("bit_or(c_custkey)").as("bo"),
          expr("any_value(c_nationkey)").cast("long").as("av"))
        .orderBy("nation")
    },
    Some("""WITH x AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % 7 = 0 THEN 'NaN'::DOUBLE
                    WHEN c_custkey % 7 = 1 THEN 'Infinity'::DOUBLE
                    WHEN c_custkey % 7 = 2 THEN '-Infinity'::DOUBLE
                    ELSE c_acctbal - 4500.0 END AS v
        FROM customer)
      SELECT CAST(c_nationkey AS BIGINT) AS nation,
        count(*) FILTER (WHERE isnan(v)) AS n_nan,
        count(*) FILTER (WHERE isinf(v)) AS n_inf,
        count(*) FILTER (WHERE isfinite(v)) AS n_finite,
        sum(trunc(v)) FILTER (WHERE isfinite(v)) AS sum_trunc,
        bit_and(c_custkey) AS ba,
        bit_or(c_custkey) AS bo,
        CAST(any_value(c_nationkey) AS BIGINT) AS av
      FROM x GROUP BY c_nationkey ORDER BY nation"""))

  /** Bitwise function family — bitwise_and/or/xor and shifts (Presto
    * spells them as functions, Spark as operators; same two's-complement
    * BIGINT semantics, integer-exact on both engines). */
  private val bitwiseFns = Q(
    "q_bitwise_fns",
    (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          expr("c_custkey & 255").as("band"),
          expr("c_custkey | 4096").as("bor"),
          expr("c_custkey ^ c_nationkey").as("bxor"),
          expr("shiftleft(c_nationkey, 8)").cast("long").as("shl"),
          expr("shiftright(c_custkey, 3)").as("shr"),
          expr("~c_nationkey").cast("long").as("bnot"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
        c_custkey & 255 AS band,
        c_custkey | 4096 AS bor,
        xor(c_custkey, CAST(c_nationkey AS BIGINT)) AS bxor,
        CAST(c_nationkey AS BIGINT) << 8 AS shl,
        c_custkey >> 3 AS shr,
        CAST(~c_nationkey AS BIGINT) AS bnot
      FROM customer ORDER BY c_custkey"""))

  // -- scalar function families -------------------------------------------------

  private val stringFns = Q(
    "q_string_fns",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          when(col("p_name").like("small%"), 1).otherwise(0).as("is_small"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        upper(p_name) AS uname,
        substr(p_name, 1, 5) AS prefix5,
        CAST(length(p_name) AS BIGINT) AS name_len,
        replace(p_type, ' ', '_') AS type_us,
        trim(concat('  ', p_name, '  ')) AS trimmed,
        regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END AS is_small
      FROM part ORDER BY p_partkey"""))

  /** Presto's NULL-propagating greatest/least (deviation #23 — Presto
    * returns NULL when ANY argument is NULL; Spark/Postgres/DuckDB skip
    * nulls, a silent value shift on any nullable argument). The lag()
    * window makes the first row of every customer genuinely NULL, so both
    * semantics are load-bearing in the hash: the presto_ columns NULL
    * there, the native-contrast columns keep the non-null value. The
    * oracle spells Presto's propagation explicitly over DuckDB's
    * skip-null builtin — an independent formulation. */
  private val condNullExtrema = Q(
    "q_cond_null_extrema",
    (s, d) => {
      import graft.functions.PrestoCondFunctions._
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          lag("o_totalprice", 1).over(w).as("prev"))
        .select(
          col("o_orderkey"),
          prestoGreatest(col("o_totalprice"), col("prev")).cast("double").as("pg"),
          prestoLeast(col("o_totalprice"), col("prev")).cast("double").as("pl"),
          greatest(col("o_totalprice"), col("prev")).as("sg"),
          least(col("o_totalprice"), col("prev")).as("sl"))
        .orderBy("o_orderkey")
    },
    Some("""WITH p AS (
        SELECT o_orderkey, o_totalprice,
               lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
        FROM orders)
      SELECT o_orderkey,
        CASE WHEN prev IS NULL THEN NULL ELSE greatest(o_totalprice, prev) END AS pg,
        CASE WHEN prev IS NULL THEN NULL ELSE least(o_totalprice, prev) END AS pl,
        greatest(o_totalprice, prev) AS sg,
        least(o_totalprice, prev) AS sl
      FROM p ORDER BY o_orderkey"""))

  /** Conditional-expression surface declared explicitly (if/nullif/
    * coalesce appear INSIDE many rows, but a Presto migrant types them
    * directly) plus printf-style formatting. All codegen'd projections. */
  private val condFns = Q(
    "q_cond_fns",
    (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big").otherwise("small").as("size_tag"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio_or_null"),
          coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("URGENT!"))
            .as("prio_norm"),
          format_string("%07d", col("o_orderkey")).as("key_padded"),
          (col("o_orderstatus") === "O").cast("boolean").as("is_open"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_tag,
        nullif(o_orderpriority, '1-URGENT') AS prio_or_null,
        coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_norm,
        printf('%07d', o_orderkey) AS key_padded,
        o_orderstatus = 'O' AS is_open
      FROM orders ORDER BY o_orderkey"""))

  /** Second string-function wave — the Presto helpers the first row left
    * out: split_part, strpos, lpad/rpad, reverse, translate, repeat, and
    * levenshtein (the scalar edit-distance fn; the JOIN on it is
    * q_join_fuzzy's job). All codegen'd built-ins, narrow projection. */
  private val stringFns2 = Q(
    "q_string_fns2",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          split_part(col("p_name"), lit(" "), lit(2)).as("word2"),
          instr(col("p_name"), "a").cast("long").as("first_a"),
          lpad(col("p_brand"), 12, "#").as("brand_pad"),
          reverse(col("p_type")).as("type_rev"),
          translate(col("p_name"), "aeiou", "_____").as("devoweled"),
          repeat(lit("ab"), 3).as("ab3"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("edit_dist"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        split_part(p_name, ' ', 2) AS word2,
        CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        lpad(p_brand, 12, '#') AS brand_pad,
        reverse(p_type) AS type_rev,
        translate(p_name, 'aeiou', '_____') AS devoweled,
        repeat('ab', 3) AS ab3,
        CAST(levenshtein(p_brand, p_type) AS BIGINT) AS edit_dist
      FROM part ORDER BY p_partkey"""))

  /** Presto's regexp family in one declared row — regexp_like,
    * regexp_extract, regexp_extract_all (serialized per the array
    * convention), global regexp_replace, and regexp_count — the surface a
    * security-lake migrant leans on hardest (the reference's Athena
    * queries live on string munging). Patterns are dialect-portable
    * (character classes + anchors + alternation only, no lookaround);
    * the oracle replays them in DuckDB's RE2, where regexp_replace needs
    * the explicit 'g' flag (Spark replaces globally by default — a burned
    * pitfall) and regexp_count is replayed as len(regexp_extract_all).
    * All codegen'd projections over a narrow scan. */
  private val regexpFns = Q(
    "q_regexp_fns",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          col("p_name").rlike("^[aeiou]").as("starts_vowel"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          array_join(regexp_extract_all(col("p_name"), lit("([a-z]+)"), lit(1)), ",")
            .as("words_csv"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
          regexp_count(col("p_name"), lit("[a-z]+")).cast("long").as("n_words"),
          col("p_type").rlike("^(ECONOMY|PROMO)").as("is_econ_promo"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        regexp_matches(p_name, '^[aeiou]') AS starts_vowel,
        regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        coalesce(array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), ','), '') AS words_csv,
        regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
        CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
        regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_econ_promo
      FROM part ORDER BY p_partkey"""))

  /** Presto's binary-codec surface (to_base64/from_base64, to_hex/
    * from_hex, codepoint, chr) — the encode/decode idioms a security lake
    * lives on (encoded payloads, hex IOCs). Spark spells them base64/
    * unbase64/hex/unhex/ascii/char over explicit UTF-8 encode/decode;
    * both round-trips are declared (decode∘from∘to == id), so a silent
    * padding or case mismatch between the codecs cannot pass. All
    * codegen'd; narrow scan. */
  private val encodingFns = Q(
    "q_encoding_fns",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          base64(encode(col("p_name"), "UTF-8")).as("b64"),
          decode(unbase64(base64(encode(col("p_name"), "UTF-8"))), "UTF-8").as("b64_rt"),
          hex(encode(col("p_name"), "UTF-8")).as("hexed"),
          decode(unhex(hex(encode(col("p_name"), "UTF-8"))), "UTF-8").as("hex_rt"),
          ascii(col("p_name")).cast("long").as("first_cp"),
          expr("char(65 + p_partkey % 26)").as("letter"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        to_base64(encode(p_name)) AS b64,
        decode(from_base64(to_base64(encode(p_name)))) AS b64_rt,
        hex(p_name) AS hexed,
        decode(unhex(hex(p_name))) AS hex_rt,
        CAST(ascii(p_name) AS BIGINT) AS first_cp,
        chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS letter
      FROM part ORDER BY p_partkey"""))

  /** Presto `normalize(s [, form])` — Unicode NFC/NFKC normalization
    * (r13 verdict missing #1). The corpus text is ASCII, so the row
    * CONSTRUCTS a mixed-normalization column: odd part keys get the
    * DECOMPOSED "e" + U+0301 combining acute, even keys the PRECOMPOSED
    * U+00E9 — byte-different, canonically equal. The declared output is
    * the canonicalize-before-dedup-key idiom the dedup stack needs
    * (normalize → md5 key): without NFC first, the two spellings of the
    * same text land in different dedup buckets. NFC is oracled against
    * DuckDB's native nfc_normalize; NFKC (compatibility mapping — the
    * U+FB01 "fi" ligature folds to "fi") has no DuckDB twin, so its
    * expected value is constructed from first principles in the oracle
    * (the input ligature is a literal this row itself plants).
    * Codegen'd expression (TextCompat.scala), registered via
    * GraftExtensions — scale shape: a narrow projection, no exchange. */
  private val stringNormalize = Q(
    "q_string_normalize",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"), col("p_brand"),
          concat(
            col("p_name"), lit(" caf"),
            when(col("p_partkey") % 2 === 1, lit("e\u0301"))
              .otherwise(lit("\u00e9"))).as("raw"))
        .select(
          col("p_partkey"),
          graft.functions.TextFunctions.normalize(col("raw")).as("norm"),
          (graft.functions.TextFunctions.normalize(col("raw")) =!= col("raw"))
            .as("nfc_changed"),
          md5(graft.functions.TextFunctions.normalize(col("raw"))).as("dedup_key"),
          graft.functions.TextFunctions.normalize(
            concat(lit("\ufb01"), col("p_brand")), "NFKC").as("nfkc_demo"))
        .orderBy("p_partkey"),
    Some("""WITH r AS (
        SELECT p_partkey, p_brand,
          p_name || ' caf' ||
            CASE WHEN p_partkey % 2 = 1 THEN 'e' || chr(769) ELSE chr(233) END AS raw
        FROM part)
      SELECT p_partkey,
        nfc_normalize(raw) AS norm,
        nfc_normalize(raw) != raw AS nfc_changed,
        md5(nfc_normalize(raw)) AS dedup_key,
        'fi' || p_brand AS nfkc_demo
      FROM r ORDER BY p_partkey"""))

  /** Presto `date_parse(str, '%Y-%m-%d...')` — the MYSQL %-pattern dialect,
    * the highest-traffic Athena datetime parse (a DIFFERENT pattern
    * language from the Joda pair q_date_presto_fmt covers). The translator
    * (TextOps.mysqlToJava) maps %i→minutes vs %M→month NAME (the classic
    * MySQL trap), composite %T/%r, and rejects week-based fields by name;
    * the call lowers onto the native codegen'd to_timestamp.
    * DOCUMENTED DEVIATION (GraftExtensions): Presto's %-dialect
    * date_format is NOT registered — the name would shadow Spark's
    * java-pattern built-in of the same arity; migrants use
    * format_datetime (Joda) or native patterns. The row renders strings
    * with NATIVE date_format (java patterns), parses them back through
    * three MySQL pattern shapes (ISO with %i/%s, month-name %M, composite
    * %T), and asserts the round trips; the oracle replays with DuckDB
    * strptime %-codes (hand-mapped: DuckDB %M is MINUTES, MySQL %M is
    * month name). Narrow projection, no exchange. */
  private val dateParse = Q(
    "q_date_parse",
    (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").as("ts"))
        .select(
          col("o_orderkey"),
          TF.dateParse(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            "%Y-%m-%d %H:%i:%s").as("iso_parsed"),
          TF.dateParse(date_format(col("ts"), "MMMM dd, yyyy"),
            "%M %d, %Y").as("texty_parsed"),
          (TF.dateParse(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            "%Y-%m-%d %T") === col("ts")).as("t_ok"),
          (TF.dateParse(date_format(col("ts"), "MMMM dd, yyyy"),
            "%M %d, %Y") === col("ts")).as("texty_ok"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                 '%Y-%m-%d %H:%M:%S') AS iso_parsed,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%B %d, %Y'),
                 '%B %d, %Y') AS texty_parsed,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                 '%Y-%m-%d %H:%M:%S') = CAST(o_orderdate AS TIMESTAMP) AS t_ok,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%B %d, %Y'),
                 '%B %d, %Y') = CAST(o_orderdate AS TIMESTAMP) AS texty_ok
      FROM orders ORDER BY o_orderkey"""))

  /** The FORMAT direction of Presto's MySQL %-pattern dialect
    * (r14 verdict missing #1 — q_date_parse closed the parse direction;
    * this row closes the asymmetry). Presto's own spelling is
    * `date_format`, which would shadow Spark's java-pattern built-in of
    * the same arity, so the SQL registration is the NON-SHADOWING
    * `presto_date_format` (GraftExtensions; EngineSpec pins the SQL
    * spelling) over the same TextOps.mysqlToJava translator — including
    * the %i-minutes/%M-month-name trap, now exercised in BOTH directions,
    * and composite %T. Declared as parse→format→parse round trips so a
    * translator asymmetry cannot pass: rt_ok pins
    * date_parse(presto_date_format(ts, p), p) == ts row-for-row. The
    * oracle replays with DuckDB strftime %-codes (hand-mapped: DuckDB %M
    * is MINUTES where MySQL %M is month name; %B is the month-name
    * spelling). Narrow projection, no exchange. */
  private val datePrestoRoundtrip = Q(
    "q_date_presto_roundtrip",
    (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").as("ts"))
        .select(
          col("o_orderkey"),
          TF.prestoDateFormat(col("ts"), "%Y-%m-%d %H:%i:%s").as("iso_s"),
          TF.prestoDateFormat(col("ts"), "%M %d, %Y").as("texty_s"),
          TF.prestoDateFormat(col("ts"), "%j/%Y %T").as("doy_s"),
          (TF.dateParse(TF.prestoDateFormat(col("ts"), "%Y-%m-%d %H:%i:%s"),
            "%Y-%m-%d %H:%i:%s") === col("ts")).as("rt_iso_ok"),
          (TF.dateParse(TF.prestoDateFormat(col("ts"), "%M %d, %Y"),
            "%M %d, %Y") === col("ts")).as("rt_texty_ok"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS iso_s,
        strftime(CAST(o_orderdate AS TIMESTAMP), '%B %d, %Y') AS texty_s,
        strftime(CAST(o_orderdate AS TIMESTAMP), '%j/%Y %H:%M:%S') AS doy_s,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                 '%Y-%m-%d %H:%M:%S') = CAST(o_orderdate AS TIMESTAMP) AS rt_iso_ok,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%B %d, %Y'),
                 '%B %d, %Y') = CAST(o_orderdate AS TIMESTAMP) AS rt_texty_ok
      FROM orders ORDER BY o_orderkey"""))

  /** Record-linkage string metrics beside levenshtein: Jaro-Winkler
    * similarity (the fuzzy-join family's scoring metric — codegen'd
    * expression, TextCompat.scala; variant matches DuckDB's exactly:
    * boost threshold 0.7, prefix cap 4, empty operands score 0) and
    * Presto's `hamming_distance` (equal-length position diff). The row
    * builds same-length comparison pairs by deterministic character
    * translation, so hamming's length contract holds by construction,
    * and routes the double scores through the decimal round device
    * (both engines fold (m/la + m/lb + (m-t)/m)/3 in doubles; identical
    * op order makes them bit-equal, the round pins it). Narrow
    * projection, no exchange. */
  private val stringMetrics = Q(
    "q_string_metrics",
    (s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
          translate(col("p_name"), "aeo", "eoa").as("typo"),
          translate(col("p_brand"), "0123456789", "1234567890").as("shifted"))
        .select(
          col("p_partkey"),
          round(TF.jaroWinkler(col("p_name"), col("typo")).cast("decimal(24,8)"), 6)
            .cast("double").as("jw_typo"),
          round(TF.jaroWinkler(col("p_brand"), col("p_type")).cast("decimal(24,8)"), 6)
            .cast("double").as("jw_cross"),
          TF.hammingDistance(col("p_brand"), col("shifted")).as("ham_digits"))
        .orderBy("p_partkey"),
    Some("""WITH r AS (
        SELECT p_partkey, p_name, p_brand, p_type,
          translate(p_name, 'aeo', 'eoa') AS typo,
          translate(p_brand, '0123456789', '1234567890') AS shifted
        FROM part)
      SELECT p_partkey,
        CAST(round(CAST(jaro_winkler_similarity(p_name, typo) AS DECIMAL(24,8)), 6) AS DOUBLE) AS jw_typo,
        CAST(round(CAST(jaro_winkler_similarity(p_brand, p_type) AS DECIMAL(24,8)), 6) AS DOUBLE) AS jw_cross,
        CAST(hamming(p_brand, shifted) AS BIGINT) AS ham_digits
      FROM r ORDER BY p_partkey"""))

  private val dateFns = Q(
    "q_date_fns",
    (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          unix_timestamp(col("o_orderdate").cast("timestamp")).as("epoch_s"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(day(o_orderdate) AS BIGINT) AS dom,
        strftime(o_orderdate, '%Y-%m-%d') AS ds,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
      FROM orders ORDER BY o_orderkey"""))

  /** Second date-function wave: quarter, last_day, ISO week, day-of-week,
    * calendar-month shifts. dow is normalized to 0=Sunday on both engines
    * (Spark's dayofweek is 1-based Sunday, DuckDB's 0-based); the month
    * index is plain integer arithmetic so no engine's fractional
    * months_between convention is in the hash. */
  private val dateFns2 = Q(
    "q_date_fns2",
    (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus2m"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - (1995 * 12 + 1))
            .cast("long").as("mo_idx"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
        CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
        CAST(year(o_orderdate) * 12 + month(o_orderdate) - (1995 * 12 + 1) AS BIGINT) AS mo_idx
      FROM orders ORDER BY o_orderkey"""))

  private val mathFns = Q(
    "q_math_fns",
    (s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          // round(double,2) half-boundary behavior differs between engines
          // (Java shortest-repr HALF_UP vs C-style on the raw binary value);
          // going through decimal(24,6) first makes both engines round the
          // same decimal value, deterministically.
          round((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .cast("decimal(24,6)"), 2).cast("double").as("charge"),
          round(abs(col("l_discount") - 0.05).cast("decimal(24,6)"), 4).cast("double").as("absd"),
          ceil(col("l_quantity") / 7.0).as("q7"),
          floor(log10(col("l_extendedprice") + 1)).as("price_mag"),
          (col("l_quantity").cast("long") % 5).as("qmod"))
        .orderBy("l_orderkey", "l_linenumber", "charge", "absd"),
    Some("""SELECT l_orderkey, l_linenumber,
        CAST(round(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6)), 2) AS DOUBLE) AS charge,
        CAST(round(CAST(abs(l_discount - 0.05) AS DECIMAL(24,6)), 4) AS DOUBLE) AS absd,
        CAST(ceil(l_quantity / 7.0) AS BIGINT) AS q7,
        CAST(floor(log10(l_extendedprice + 1)) AS BIGINT) AS price_mag,
        CAST(l_quantity AS BIGINT) % 5 AS qmod
      FROM lineitem ORDER BY l_orderkey, l_linenumber, charge, absd"""))

  /** Transcendental/comparison math wave: exp, ln, log2, sqrt, power,
    * signum, greatest/least. Every continuous output rounds through the
    * decimal convention (both engines' libm results agree well past 6dp;
    * the rounding pins the hash against last-bit formatting drift). */
  private val mathFns2 = Q(
    "q_math_fns2",
    (s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(exp(col("l_discount")).cast("decimal(24,12)"), 6).cast("double").as("e_disc"),
          round(log(col("l_extendedprice")).cast("decimal(24,12)"), 6).cast("double").as("ln_price"),
          round(log2(col("l_quantity")).cast("decimal(24,12)"), 6).cast("double").as("log2_qty"),
          round(sqrt(col("l_quantity")).cast("decimal(24,12)"), 6).cast("double").as("sqrt_qty"),
          round(pow(lit(1) + col("l_tax"), 2).cast("decimal(24,12)"), 6).cast("double").as("taxf_sq"),
          signum(col("l_discount") - 0.05).cast("long").as("sgn_disc"),
          greatest(col("l_quantity"), lit(25.0)).as("qty_floor25"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
        .orderBy("l_orderkey", "l_linenumber", "e_disc", "ln_price"),
    Some("""SELECT l_orderkey, l_linenumber,
        CAST(round(CAST(exp(l_discount) AS DECIMAL(24,12)), 6) AS DOUBLE) AS e_disc,
        CAST(round(CAST(ln(l_extendedprice) AS DECIMAL(24,12)), 6) AS DOUBLE) AS ln_price,
        CAST(round(CAST(log2(l_quantity) AS DECIMAL(24,12)), 6) AS DOUBLE) AS log2_qty,
        CAST(round(CAST(sqrt(l_quantity) AS DECIMAL(24,12)), 6) AS DOUBLE) AS sqrt_qty,
        CAST(round(CAST(power(1 + l_tax, 2) AS DECIMAL(24,12)), 6) AS DOUBLE) AS taxf_sq,
        CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn_disc,
        greatest(l_quantity, 25.0) AS qty_floor25,
        least(l_discount, l_tax) AS min_rate
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, e_disc, ln_price"""))

  /** Cryptographic digest surface (Presto md5/sha256): content-addressed
    * keys are how a lake dedups payloads and builds stable row ids; both
    * engines emit lowercase hex. Narrow projection, codegen'd. */
  private val stringHash = Q(
    "q_string_hash",
    (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          md5(col("p_name").cast("binary")).as("name_md5"),
          sha2(col("p_name").cast("binary"), 256).as("name_sha256"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        md5(p_name) AS name_md5,
        sha256(p_name) AS name_sha256
      FROM part ORDER BY p_partkey"""))

  /** width_bucket (ANSI/Presto equi-width binning) rolled into the
    * histogram-count shape it exists for. The oracle replays Spark's
    * bucket formula arithmetically (DuckDB has no width_bucket); the
    * 50000.0 bucket width is exactly representable so the floor is
    * FP-stable on both engines. */
  private val aggWidthBucket = Q(
    "q_agg_width_bucket",
    (s, d) =>
      t(s, d, "orders")
        .select(width_bucket(col("o_totalprice"), lit(0d), lit(600000d), lit(12)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
    Some("""SELECT CASE WHEN o_totalprice < 0 THEN 0
                        WHEN o_totalprice >= 600000 THEN 13
                        ELSE CAST(floor(o_totalprice / (600000.0 / 12)) AS BIGINT) + 1
                   END AS bucket,
          count(*) AS n
        FROM orders GROUP BY 1 ORDER BY bucket"""))

  private val arrayFns = Q(
    "q_array_fns",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", split(col("p_name"), " "))
        .select(
          col("p_partkey"),
          size(col("words")).cast("long").as("n_words"),
          element_at(col("words"), 1).as("w1"),
          array_contains(col("words"), "green").as("has_green"),
          array_join(array_sort(array_distinct(col("words"))), ",").as("uniq_sorted"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        string_split(p_name, ' ')[1] AS w1,
        list_contains(string_split(p_name, ' '), 'green') AS has_green,
        array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS uniq_sorted
      FROM part ORDER BY p_partkey"""))

  /** Presto's array-lambda (higher-order function) surface — an Athena user
    * reshapes JSON-derived arrays with `transform/filter/reduce(arr, x -> …)`
    * (reference README.md:116 "any valid Presto SQL"); Spark's
    * `transform`/`filter`/`aggregate` built-ins are the codegen'd twins (no
    * UDF, the lambda compiles into the same whole-stage codegen span as the
    * projection). Collection outputs serialize with array_join per the
    * driver-gate convention (r10 verdict task 1); the fold result is a plain
    * BIGINT. At 100 TB this is a narrow per-row projection — no shuffle. */
  private val arrayLambda = Q(
    "q_array_lambda",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", split(col("p_name"), " "))
        .select(
          col("p_partkey"),
          array_join(transform(col("words"), w => length(w).cast("string")), ",")
            .as("word_lens"),
          array_join(filter(col("words"), w => length(w) > 5), ",").as("long_words"),
          aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)).as("chars_total"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        array_to_string(list_transform(string_split(p_name, ' '),
          x -> CAST(length(x) AS VARCHAR)), ',') AS word_lens,
        COALESCE(array_to_string(list_filter(string_split(p_name, ' '),
          x -> length(x) > 5), ','), '') AS long_words,
        CAST(list_aggregate(list_transform(string_split(p_name, ' '),
          x -> length(x)), 'sum') AS BIGINT) AS chars_total
      FROM part ORDER BY p_partkey"""))

  /** Quantifier lambdas — `exists` / `forall` (Presto `any_match` /
    * `all_match`), completing the HOF family beside transform/filter/
    * aggregate: per-part word-list predicates (any long word? all words
    * alphabetic? any word starting with a vowel?). DuckDB has no
    * quantifier built-ins, so the oracle derives each from list_filter
    * cardinality (`len(filter) > 0` / `len(filter) = len(list)`) — an
    * independent formulation that also pins the short-circuit semantics
    * against the exhaustive one. Codegen'd narrow projection; no
    * shuffle before the output sort. */
  private val arrayQuantifiers = Q(
    "q_array_quantifiers",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", split(col("p_name"), " "))
        .select(
          col("p_partkey"),
          exists(col("words"), w => length(w) > 8).as("any_long"),
          forall(col("words"), w => w.rlike("^[a-z]+$")).as("all_alpha"),
          exists(col("words"), w => w.rlike("^[aeiou]")).as("any_vowel_start"),
          size(col("words")).cast("long").as("n_words"))
        .orderBy("p_partkey"),
    Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
      SELECT p_partkey,
        len(list_filter(words, x -> length(x) > 8)) > 0 AS any_long,
        len(list_filter(words, x -> regexp_matches(x, '^[a-z]+$'))) = len(words) AS all_alpha,
        len(list_filter(words, x -> regexp_matches(x, '^[aeiou]'))) > 0 AS any_vowel_start,
        CAST(len(words) AS BIGINT) AS n_words
      FROM w ORDER BY p_partkey"""))

  /** Comparator-lambda sort (Presto `array_sort(array, (l, r) -> ...)`;
    * Spark's two-arg `array_sort`) — the custom collation an Athena user
    * reaches for when natural order is wrong. Sorts each part's words by
    * (length, then alpha); the natural sort rides along so the row proves
    * the comparator actually CHANGED the order. The oracle has no lambda
    * comparator, so it replays the same total order by the schwartzian
    * prefix trick: pack a zero-padded length key before each word,
    * natural-sort, strip — an independent formulation, not a mirror of
    * the comparator. Narrow per-row HOF; no shuffle before the output
    * sort. */
  private val arraySortLambda = Q(
    "q_array_sort_lambda",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", split(col("p_name"), " "))
        .select(
          col("p_partkey"),
          array_join(array_sort(col("words")), ",").as("natural_sort"),
          array_join(
            array_sort(col("words"), (l, r) =>
              when(length(l) < length(r), -1)
                .when(length(l) > length(r), 1)
                .when(l < r, -1)
                .when(l > r, 1)
                .otherwise(0)),
            ",").as("by_len_sort"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        array_to_string(list_sort(string_split(p_name, ' ')), ',') AS natural_sort,
        array_to_string(
          list_transform(
            list_sort(list_transform(string_split(p_name, ' '),
              w -> lpad(CAST(len(w) AS VARCHAR), 2, '0') || w)),
            s -> s[3:]),
          ',') AS by_len_sort
      FROM part ORDER BY p_partkey"""))

  private val explodeFn = Q(
    "q_explode",
    (s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
        .orderBy("p_partkey", "word"),
    Some("""SELECT p_partkey, word FROM (
        SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part) sub
      ORDER BY p_partkey, word"""))

  /** Map-typed column functions (§2B array/map row): build a word→length map
    * per part, then size / lookup / keys / value-fold over it. The oracle
    * computes the same values with DuckDB list functions — the check is on
    * results, not on both engines sharing a map type. */
  private val mapFns = Q(
    "q_map_fns",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", array_distinct(slice(split(col("p_name"), " "), 1, 3)))
        .withColumn(
          "m",
          map_from_arrays(col("words"), transform(col("words"), w => length(w))))
        .select(
          col("p_partkey"),
          size(col("m")).cast("long").as("m_size"),
          element_at(col("m"), element_at(col("words"), 1)).cast("long").as("v_first"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
          aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("vals_sum"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        CAST(len(list_distinct(string_split(p_name, ' ')[1:3])) AS BIGINT) AS m_size,
        CAST(length(string_split(p_name, ' ')[1]) AS BIGINT) AS v_first,
        array_to_string(list_sort(list_distinct(string_split(p_name, ' ')[1:3])), ',') AS keys_sorted,
        CAST(list_aggregate(list_transform(list_distinct(string_split(p_name, ' ')[1:3]),
             x -> length(x)), 'sum') AS BIGINT) AS vals_sum
      FROM part ORDER BY p_partkey"""))

  /** Presto's MAP higher-order functions — transform_keys /
    * transform_values / map_filter, the map twins of q_array_lambda's
    * array lambdas (Spark ships all three natively; codegen'd, no UDF).
    * The oracle computes the same values from DuckDB lists — the check is
    * on results, not on both engines sharing a map lambda type (same
    * contract as q_map_fns). Map-typed intermediates never leave the
    * projection; outputs serialize per the driver-gate convention. */
  private val mapLambda = Q(
    "q_map_lambda",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", array_distinct(slice(split(col("p_name"), " "), 1, 3)))
        .withColumn(
          "m",
          map_from_arrays(col("words"), transform(col("words"), w => length(w))))
        .select(
          col("p_partkey"),
          array_join(array_sort(map_keys(transform_keys(col("m"), (k, _) => upper(k)))), ",")
            .as("keys_upper"),
          aggregate(
            map_values(transform_values(col("m"), (_, v) => v * 2)),
            lit(0L), (a, x) => a + x).as("vals_doubled_sum"),
          size(map_filter(col("m"), (_, v) => v > 5)).cast("long").as("n_long_keys"))
        .orderBy("p_partkey"),
    Some("""WITH w AS (
        SELECT p_partkey, list_distinct(string_split(p_name, ' ')[1:3]) AS words FROM part)
      SELECT p_partkey,
        array_to_string(list_sort(list_transform(words, x -> upper(x))), ',') AS keys_upper,
        CAST(list_aggregate(list_transform(words, x -> 2 * length(x)), 'sum') AS BIGINT)
          AS vals_doubled_sum,
        CAST(len(list_filter(words, x -> length(x) > 5)) AS BIGINT) AS n_long_keys
      FROM w ORDER BY p_partkey"""))

  /** str_to_map — Presto `split_to_map(s, '&', '=')`, Spark's built-in
    * `str_to_map` (codegen'd, no UDF): the idiomatic way to rip `k=v&k=v`
    * payloads out of a string column without a full JSON parse. The
    * reference's users live in string payloads (`details` blobs queried
    * with "any valid Presto SQL", /root/reference/README.md:112-116), and
    * querystring-shaped fields are the ones JSON accessors don't reach.
    * The payload is synthesized from orders columns so the parse is
    * verifiable; extraction (element_at), cardinality (size), and the
    * sorted-keys serialization all come out of the ONE parsed map. The
    * oracle replays the parse with DuckDB list functions — the check is
    * on parsed results, not on both engines sharing a map type (the
    * q_map_fns contract). Scale shape: a per-row projection feeding one
    * low-cardinality hash aggregate — no shuffle before the group-by,
    * whole-stage codegen end to end. */
  private val mapParse = Q(
    "q_map_parse",
    (s, d) =>
      t(s, d, "orders")
        .withColumn("payload", concat(
          lit("status="), col("o_orderstatus"),
          lit("&prio="), col("o_orderpriority"),
          lit("&cust="), col("o_custkey")))
        .withColumn("m", str_to_map(col("payload"), lit("&"), lit("=")))
        .select(
          element_at(col("m"), "status").as("status"),
          element_at(col("m"), "prio").as("prio"),
          element_at(col("m"), "cust").cast("long").as("cust"),
          size(col("m")).cast("long").as("n_keys"),
          array_join(array_sort(map_keys(col("m"))), "|").as("keys"))
        .groupBy("status", "prio", "n_keys", "keys")
        .agg(count(lit(1)).as("n"), sum("cust").as("sum_cust"))
        .orderBy("status", "prio"),
    Some("""WITH kv AS (
        SELECT list_transform(
            string_split('status=' || o_orderstatus || '&prio=' || o_orderpriority
                         || '&cust=' || CAST(o_custkey AS VARCHAR), '&'),
            x -> string_split(x, '=')) AS pairs
        FROM orders),
      f AS (
        SELECT
          list_filter(pairs, x -> x[1] = 'status')[1][2] AS status,
          list_filter(pairs, x -> x[1] = 'prio')[1][2] AS prio,
          CAST(list_filter(pairs, x -> x[1] = 'cust')[1][2] AS BIGINT) AS cust,
          CAST(len(pairs) AS BIGINT) AS n_keys,
          array_to_string(list_sort(list_transform(pairs, x -> x[1])), '|') AS keys
        FROM kv)
      SELECT status, prio, n_keys, keys,
        count(*) AS n, CAST(sum(cust) AS BIGINT) AS sum_cust
      FROM f GROUP BY status, prio, n_keys, keys
      ORDER BY status, prio"""))

  /** Array generation + reshaping surface — sequence (Presto's
    * sequence/DuckDB generate_series), slice, flatten, arrays_overlap.
    * All narrow per-row projections; the generated arrays are bounded
    * (≤4 elements) so output size is row-proportional at any scale. */
  /** Presto `ngrams(array, n)` — word n-gram extraction as a standalone
    * declared fn (the same sequence+slice device q_contamination uses
    * inline, here in its Presto-surface form). Spark has no ngrams
    * built-in; the codegen'd HOF composition is exact: one window start
    * per position, each n-gram serialized space-joined, the list
    * serialized per the array_join convention (nested arrays cannot ride
    * the gate). Bigram + trigram columns over part names (4-6 words);
    * docs-scale n-gram work stays with the dedup family. Narrow
    * projection, no exchange. */
  private val arrayNgrams = Q(
    "q_array_ngrams",
    (s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          split(concat(col("p_name"), lit(" "), col("p_type")), " ").as("ws"))
        .select(
          col("p_partkey"),
          // codegen'd n-gram kernel (r19): it returns an EMPTY array below
          // n tokens — array_join then yields the same '' the old
          // when(size >= n)...otherwise('') guard produced (the guard
          // existed because Spark's sequence(0, n) DESCENDS when n < 0 and
          // would fabricate ngrams from negative starts)
          array_join(
            graft.functions.VectorFunctions.wordNgrams(col("ws"), 2), "|").as("bigrams"),
          array_join(
            graft.functions.VectorFunctions.wordNgrams(col("ws"), 3), "|").as("trigrams"),
          greatest(size(col("ws")) - 1, lit(0)).cast("long").as("n_bigrams"))
        .orderBy("p_partkey"),
    Some("""WITH w AS (SELECT p_partkey,
          string_split(p_name || ' ' || p_type, ' ') AS ws FROM part)
      SELECT p_partkey,
        CASE WHEN len(ws) >= 2 THEN
          coalesce(array_to_string(
            [array_to_string(ws[i + 1:i + 2], ' ')
             FOR i IN range(0, len(ws) - 1)], '|'), '')
        ELSE '' END AS bigrams,
        CASE WHEN len(ws) >= 3 THEN
          coalesce(array_to_string(
            [array_to_string(ws[i + 1:i + 3], ' ')
             FOR i IN range(0, len(ws) - 2)], '|'), '')
        ELSE '' END AS trigrams,
        CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_bigrams
      FROM w ORDER BY p_partkey"""))

  private val arrayGen = Q(
    "q_array_gen",
    (s, d) => {
      // key cast in its OWN projection: casting n_nationkey in the same
      // select whose siblings embed sq (which references n_nationkey)
      // would self-shadow a referenced input name (EngineSpec lint)
      val base = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"))
      val sq = sequence(lit(1L), col("n_nationkey") % 4 + 1)
      base
        .select(
          col("n_nationkey"),
          array_join(transform(sq, i => i.cast("string")), ",").as("seq_str"),
          array_join(transform(slice(sq, 2, 2), i => i.cast("string")), ",").as("mid_str"),
          aggregate(sq, lit(0L), (a, x) => a + x).as("seq_sum"),
          size(flatten(array(sq, sq))).cast("long").as("flat_n"),
          arrays_overlap(sq, array(lit(3L), lit(4L))).as("hits_34"))
        .orderBy("n_nationkey")
    },
    Some("""WITH g AS (
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               generate_series(1, CAST(n_nationkey AS BIGINT) % 4 + 1) AS sq
        FROM nation)
      SELECT n_nationkey,
        array_to_string(list_transform(sq, x -> CAST(x AS VARCHAR)), ',') AS seq_str,
        COALESCE(array_to_string(list_transform(sq[2:3], x -> CAST(x AS VARCHAR)), ','), '')
          AS mid_str,
        CAST(list_aggregate(sq, 'sum') AS BIGINT) AS seq_sum,
        CAST(len(flatten([sq, sq])) AS BIGINT) AS flat_n,
        len(list_intersect(sq, [3, 4])) > 0 AS hits_34
      FROM g ORDER BY n_nationkey"""))

  /** Pairwise array combination (Presto zip_with) + membership/edit surface
    * (array_position, array_remove, array_union). The oracle computes the
    * zip through a single list_transform (same elementwise values) and
    * normalizes the engines' divergent empties: DuckDB list_position is
    * NULL where Spark array_position is 0, so the oracle COALESCEs. Union
    * output is sorted — Spark's array_union order is first-occurrence,
    * DuckDB's list_distinct is unspecified; sorting is the only
    * cross-engine canonical form. */
  private val arrayZip = Q(
    "q_array_zip",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", split(col("p_name"), " "))
        .select(
          col("p_partkey"),
          array_join(
            zip_with(col("words"), transform(col("words"), w => length(w)),
              (w, l) => concat(w, lit(":"), l.cast("string"))), ",").as("tagged"),
          array_position(col("words"), "green").cast("long").as("green_pos"),
          array_join(array_remove(col("words"), "green"), ",").as("no_green"),
          array_join(array_sort(array_union(col("words"), array(lit("extra")))), ",")
            .as("with_extra"))
        .orderBy("p_partkey"),
    Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
      SELECT p_partkey,
        array_to_string(list_transform(words,
          x -> x || ':' || CAST(length(x) AS VARCHAR)), ',') AS tagged,
        CAST(COALESCE(list_position(words, 'green'), 0) AS BIGINT) AS green_pos,
        COALESCE(array_to_string(list_filter(words, x -> x <> 'green'), ','), '') AS no_green,
        array_to_string(list_sort(list_distinct(list_concat(words, ['extra']))), ',')
          AS with_extra
      FROM w ORDER BY p_partkey"""))

  /** posexplode — UNNEST WITH ORDINALITY semantics (position travels with
    * the element; the oracle zips DuckDB's lockstep unnests). */
  private val explodePos = Q(
    "q_explode_pos",
    (s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("col").as("word"))
        .orderBy("p_partkey", "pos"),
    Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
      SELECT p_partkey, CAST(unnest(range(len(words))) AS BIGINT) AS pos, unnest(words) AS word
      FROM w ORDER BY p_partkey, pos"""))

  /** Presto's multi-array UNNEST(a, b) — LOCKSTEP expansion (element i of
    * every array shares a row, shorter arrays pad with NULL; here lengths
    * match by construction). Spark has no multi-arg explode, so the
    * idiomatic translation is arrays_zip → explode → project — the struct
    * is a projection-internal detail, the declared output stays atomic.
    * The oracle uses DuckDB's native lockstep unnest of two lists. */
  private val explodeMulti = Q(
    "q_explode_multi",
    (s, d) =>
      t(s, d, "part")
        .withColumn("words", split(col("p_name"), " "))
        .withColumn("lens", transform(col("words"), w => length(w).cast("long")))
        .select(col("p_partkey"), explode(arrays_zip(col("words"), col("lens"))).as("z"))
        .select(
          col("p_partkey"), col("z.words").as("word"), col("z.lens").as("wlen"))
        .orderBy("p_partkey", "word", "wlen"),
    Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
      SELECT p_partkey, word, wlen FROM (
        SELECT p_partkey, unnest(words) AS word,
               unnest(list_transform(words, x -> CAST(length(x) AS BIGINT))) AS wlen
        FROM w) sub
      ORDER BY p_partkey, word, wlen"""))

  /** Presto's idiomatic array-flattening join, VERBATIM — the single most
    * common Athena spelling a migrating reference user types
    * (`CROSS JOIN UNNEST(arr) AS t(x)`; README.md:116 "any valid Presto
    * SQL"). Spark's grammar rejects UNNEST outright, so [[graft.Engine.sql]]
    * pre-parse-rewrites the simple single-array form to
    * `LATERAL VIEW explode` — this row drives that path end-to-end (the
    * rewrite mechanics, quote-awareness and loud-failure edges are pinned
    * in EngineSpec). DISTINCT makes row order unique for the compare; the
    * generator inlines into the scan projection, no join, no exchange
    * beyond the aggregate. */
  private val unnestPresto = Q(
    "q_unnest_presto",
    (s, d) => {
      Tables.views(s, d, "part")
      graft.Engine.sql(s,
        """SELECT DISTINCT p_partkey, w
           FROM part CROSS JOIN UNNEST(split(p_name, ' ')) AS t(w)
           ORDER BY p_partkey, w""")
    },
    Some("""SELECT DISTINCT p_partkey, w
      FROM part, LATERAL unnest(string_split(p_name, ' ')) t(w)
      ORDER BY p_partkey, w"""))

  /** The OUTER half of the Presto unnest-join contract, verbatim —
    * `LEFT JOIN UNNEST(arr) AS t(x) ON TRUE` keeps rows whose array is
    * empty (NULL element column) where the CROSS JOIN form drops them.
    * Engine.sql rewrites it to `LATERAL VIEW OUTER explode`; every 7th
    * part gets an empty array so the outer semantics are actually load-
    * bearing in the hash (1/7 of output rows exist ONLY because of
    * OUTER). The oracle is DuckDB's own outer lateral unnest — an
    * independent third implementation of the same contract. Generator
    * inlines into the scan, no join, no exchange beyond the sort. */
  private val unnestOuter = Q(
    "q_unnest_outer",
    (s, d) => {
      Tables.views(s, d, "part")
      graft.Engine.sql(s,
        """SELECT p_partkey, w
           FROM (SELECT p_partkey,
                        CASE WHEN p_partkey % 7 = 0 THEN array()
                             ELSE split(p_name, ' ') END AS arr
                 FROM part) p
           LEFT JOIN UNNEST(arr) AS t(w) ON TRUE
           ORDER BY p_partkey, w""")
    },
    Some("""WITH p AS (SELECT p_partkey,
                   CASE WHEN p_partkey % 7 = 0 THEN []
                        ELSE string_split(p_name, ' ') END AS arr FROM part)
      SELECT p_partkey, w
      FROM p LEFT JOIN LATERAL (SELECT unnest(arr) AS w) t ON TRUE
      ORDER BY p_partkey, w"""))

  /** `UNNEST ... WITH ORDINALITY`, verbatim (r16 verdict missing #2) — the
    * Athena spelling for array-position joins. Engine.sql rewrites it to
    * `inline(transform(arr, (e, i) -> struct(e, CAST(i + 1 AS BIGINT))))`
    * — the 0-based index of Spark's transform shifted to Presto's 1-based
    * BIGINT ordinal (the posexplode trap the r16 verdict names). The
    * oracle rebuilds the ordinal from DuckDB's lockstep unnest of the
    * array zipped with range(1, len+1) — an independent construction of
    * the same contract. Generator inlines into the scan projection: no
    * join, no exchange beyond the presentation sort. */
  private val unnestOrdinality = Q(
    "q_unnest_ordinality",
    (s, d) => {
      Tables.views(s, d, "part")
      graft.Engine.sql(s,
        """SELECT p_partkey, w, ord
           FROM part CROSS JOIN UNNEST(split(p_name, ' ')) WITH ORDINALITY AS t(w, ord)
           ORDER BY p_partkey, ord""")
    },
    Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
      SELECT p_partkey, unnest(words) AS w,
             CAST(unnest(range(1, len(words) + 1)) AS BIGINT) AS ord
      FROM w ORDER BY p_partkey, ord"""))

  /** Presto's multi-array zip `UNNEST(a, b)`, verbatim (r16 verdict missing
    * #4) — LOCKSTEP expansion padded with NULL to the LONGEST argument,
    * with a NULL array behaving as empty (still padded against the other).
    * Engine.sql rewrites to `inline(transform(slice(sequence(...)),
    * i -> struct(try_element_at(a, i), try_element_at(b, i), ...)))` —
    * try_element_at is 1-based and NULLs past-the-end, which IS the pad
    * contract (ANSI-safe where a bare subscript would throw). Every 5th
    * part carries a NULL first array so the NULL-as-empty padding is
    * load-bearing in the hash; the second array is a strict prefix so the
    * pad direction is too. The oracle indexes DuckDB lists 1-based over
    * range(1, greatest(len)+1) — out-of-bounds and NULL lists both yield
    * NULL there, the same contract constructed independently. */
  private val unnestZip = Q(
    "q_unnest_zip",
    (s, d) => {
      Tables.views(s, d, "part")
      graft.Engine.sql(s,
        """SELECT p_partkey, x, y, ord
           FROM (SELECT p_partkey,
                        CASE WHEN p_partkey % 5 = 0 THEN NULL
                             ELSE split(p_name, ' ') END AS a,
                        slice(split(p_name, ' '), 1, 2) AS b
                 FROM part) p
           CROSS JOIN UNNEST(a, b) WITH ORDINALITY AS t(x, y, ord)
           ORDER BY p_partkey, ord""")
    },
    Some("""WITH p AS (SELECT p_partkey,
               CASE WHEN p_partkey % 5 = 0 THEN NULL
                    ELSE string_split(p_name, ' ') END AS a,
               string_split(p_name, ' ')[1:2] AS b FROM part),
      n AS (SELECT p_partkey, a, b,
               greatest(coalesce(len(a), 0), coalesce(len(b), 0)) AS glen FROM p),
      i AS (SELECT p_partkey, a, b, unnest(range(1, glen + 1)) AS i FROM n)
      SELECT p_partkey, a[i] AS x, b[i] AS y, CAST(i AS BIGINT) AS ord
      FROM i ORDER BY p_partkey, ord"""))

  /** Presto's `UNNEST(zip(...))` idiom — an array of ROWS whose fields
    * UNNEST expands into columns. The rewrite is `inline` — unambiguous at
    * >= 3 columns (a map is always exactly 2; the 2-field-row case is the
    * documented deviation in Engine.rewriteUnnest's scaladoc). The row
    * builds the rows array with the VANILLA arrays_zip spelling so it runs
    * on the driver's extension-less sessions; the registered Presto `zip`
    * name (identical lowering) is pinned in EngineSpec on an
    * extensions-enabled session, the json_parse split. The oracle rebuilds
    * the same rows from DuckDB's lockstep unnests. Generator inlines into
    * the scan: x1 s1, presentation sort only. */
  private val unnestRows = Q(
    "q_unnest_rows",
    (s, d) => {
      Tables.views(s, d, "part")
      graft.Engine.sql(s,
        """SELECT p_partkey, w, CAST(wlen AS BIGINT) AS wlen, CAST(ord AS BIGINT) AS ord
           FROM (SELECT p_partkey,
                        arrays_zip(split(p_name, ' '),
                                   transform(split(p_name, ' '), x -> length(x)),
                                   sequence(1, size(split(p_name, ' ')))) AS rows_arr
                 FROM part) p
           CROSS JOIN UNNEST(rows_arr) AS t(w, wlen, ord)
           ORDER BY p_partkey, ord""")
    },
    Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
      SELECT p_partkey, unnest(words) AS w,
             CAST(unnest(list_transform(words, x -> length(x))) AS BIGINT) AS wlen,
             CAST(unnest(range(1, len(words) + 1)) AS BIGINT) AS ord
      FROM w ORDER BY p_partkey, ord"""))

  // -- subqueries (via spark.sql so Catalyst does the decorrelation) -----------

  private val subqueryIn = Q(
    "q_subquery_in",
    (s, d) => {
      Tables.views(s, d, "orders", "customer")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey IN (SELECT c_custkey FROM customer
                                   WHERE c_mktsegment = 'AUTOMOBILE')
               ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'AUTOMOBILE')
      ORDER BY o_orderkey"""))

  private val subqueryScalar = Q(
    "q_subquery_scalar",
    (s, d) => {
      Tables.views(s, d, "lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
               WHERE l_quantity > (SELECT avg(l_quantity) + 20 FROM lineitem)
               ORDER BY l_orderkey, l_linenumber, l_quantity""")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_quantity > (SELECT avg(l_quantity) + 20 FROM lineitem)
      ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** Correlated EXISTS with a non-key predicate — Catalyst decorrelates to a
    * left-semi join (same physical shape DuckDB picks), so this stays a
    * single shuffle at scale rather than a per-row probe. */
  private val subqueryExists = Q(
    "q_subquery_exists",
    (s, d) => {
      Tables.views(s, d, "customer", "orders")
      s.sql("""SELECT c_custkey, c_name FROM customer
               WHERE EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey AND o_totalprice > 400000)
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey"""))

  // -- interval arithmetic -----------------------------------------------------

  /** Time-zone conversion (Presto AT TIME ZONE; Spark from_utc_timestamp)
    * — only the UTC→local direction is declared because it is a total
    * function (every instant has exactly one local rendering), so DST is
    * exercised (NY flips -5/-4 across the corpus) without the fall-back
    * ambiguity the local→UTC direction carries. The oracle's double
    * AT TIME ZONE chain (naive AT 'UTC' → instant AT zone → naive local)
    * is session-timezone independent in DuckDB — verified under a
    * non-UTC session — matching Spark's session-tz-free from_utc_
    * timestamp. The derived offset column pins the actual UTC offset in
    * hours, so a tzdata skew between engines cannot hide in formatting. */
  private val dateTz = Q(
    "q_date_tz",
    (s, d) => {
      val ts = col("o_orderdate").cast("timestamp")
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          date_format(from_utc_timestamp(ts, "America/New_York"), "yyyy-MM-dd HH:mm")
            .as("ny_local"),
          date_format(from_utc_timestamp(ts, "Asia/Tokyo"), "yyyy-MM-dd HH:mm")
            .as("tokyo_local"),
          ((unix_timestamp(from_utc_timestamp(ts, "America/New_York"))
            - unix_timestamp(ts)) / 3600).cast("long").as("ny_offset_h"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
        strftime((CAST(o_orderdate AS TIMESTAMP) AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York',
                 '%Y-%m-%d %H:%M') AS ny_local,
        strftime((CAST(o_orderdate AS TIMESTAMP) AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo',
                 '%Y-%m-%d %H:%M') AS tokyo_local,
        CAST((epoch((CAST(o_orderdate AS TIMESTAMP) AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York')
              - epoch(CAST(o_orderdate AS TIMESTAMP))) / 3600 AS BIGINT) AS ny_offset_h
      FROM orders ORDER BY o_orderkey"""))

  private val dateIntervals = Q(
    "q_date_intervals",
    (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus_3mo"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus_30d"),
          date_format(col("o_orderdate") - expr("INTERVAL 1 WEEK"), "yyyy-MM-dd").as("minus_1w"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
        strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
        strftime(o_orderdate - INTERVAL 1 WEEK, '%Y-%m-%d') AS minus_1w
      FROM orders ORDER BY o_orderkey"""))

  /** Presto `format_datetime`/`parse_datetime` — the JODA-pattern dialect
    * (r13 verdict missing #2). Athena users format timestamps constantly,
    * and Presto's pattern language is Joda, not java.time: a pasted
    * pattern with 'Y' (Joda year-of-era) would silently become Spark's
    * WEEK-BASED year. GraftExtensions registers both names; the pattern
    * translates at resolution time (TextOps.jodaToJava — week-based Joda
    * fields are rejected by name, never misformatted) and the call lowers
    * onto the native codegen'd date_format/to_timestamp, so the hot path
    * IS a built-in. The row formats with four pattern shapes (ISO, texty
    * month/day names, zero-padded day-of-year, the hazardous bare 'Y'),
    * parses the ISO form back, and asserts the round trip — the oracle
    * replays them as DuckDB strftime/strptime %-codes. FunctionsSpec pins
    * the translator table + the week-field rejection. Narrow projection,
    * no exchange. */
  private val datePrestoFmt = Q(
    "q_date_presto_fmt",
    (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").as("ts"))
        .select(
          col("o_orderkey"),
          TF.formatDatetime(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso"),
          TF.formatDatetime(col("ts"), "EEE, dd MMM yyyy").as("texty"),
          TF.formatDatetime(col("ts"), "DDD").as("doy"),
          TF.formatDatetime(col("ts"), "Y").as("year_of_era"),
          TF.parseDatetime(
            TF.formatDatetime(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            "yyyy-MM-dd HH:mm:ss").as("parsed_back"),
          (TF.parseDatetime(
            TF.formatDatetime(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            "yyyy-MM-dd HH:mm:ss") === col("ts")).as("round_trip_ok"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS iso,
        strftime(CAST(o_orderdate AS TIMESTAMP), '%a, %d %b %Y') AS texty,
        strftime(CAST(o_orderdate AS TIMESTAMP), '%j') AS doy,
        CAST(year(o_orderdate) AS VARCHAR) AS year_of_era,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                 '%Y-%m-%d %H:%M:%S') AS parsed_back,
        strptime(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                 '%Y-%m-%d %H:%M:%S') = CAST(o_orderdate AS TIMESTAMP) AS round_trip_ok
      FROM orders ORDER BY o_orderkey"""))

  /** Fuzzy join (record linkage by edit distance) — the data-cleaning join
    * none of the equi/theta variants cover: match records whose keys differ
    * by a typo. Routed through [[graft.operators.FuzzyJoin]]'s deletion-
    * neighborhood blocking (see its scaladoc for the recall proof): each
    * side emits O(len) single-character-deletion variants, candidates meet
    * ONLY through the variant equi-join — never a cartesian with a distance
    * predicate (plan-pinned) — and the exact Levenshtein verifies INSIDE
    * the join, so only true matches materialize. This replaced the
    * half-substring pigeonhole split (r5 verdict's saturation finding):
    * that scheme's block count was capped by the keys' digit entropy
    * (~10^4-10^5 blocks), so in-block pair work grew ~n^2/blocks past
    * ~10^6 keys — deletion-variant blocks are full-length strings whose
    * entropy grows with the keyspace, and the same operator also covers
    * the length-changing edits fixed-length splitting cannot pair
    * (`q_join_fuzzy_varlen`). Result set is unchanged: for same-length
    * keys, distance <= 1 means substitution-or-equal, and the deletion
    * neighborhood finds exactly those pairs; both engines' levenshtein is
    * classic Wagner-Fischer integer DP, so the oracle (which keeps the
    * cheaper same-length blocking — DuckDB runs single-node at small SF)
    * hash-matches. */
  private val joinFuzzy = Q(
    "q_join_fuzzy",
    (s, d) => {
      val c = t(s, d, "customer")
      val a = c.select(col("c_custkey").as("key_a"), col("c_name").as("name_a"))
      val b = c.select(col("c_custkey").as("key_b"), col("c_name").as("name_b"))
      graft.operators.FuzzyJoin
        .ed1(a, b, "key_a", "name_a", "key_b", "name_b", col("key_a") < col("key_b"))
        .select(col("key_a"), col("key_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .orderBy("key_a", "key_b")
    },
    Some("""WITH c AS (SELECT c_custkey, c_name,
          substr(c_name,10,1)||substr(c_name,12,1)||substr(c_name,14,1)||substr(c_name,16,1)||substr(c_name,18,1) AS h1,
          substr(c_name,11,1)||substr(c_name,13,1)||substr(c_name,15,1)||substr(c_name,17,1) AS h2
        FROM customer),
        cand AS (
          SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
                 a.c_name AS name_a, b.c_name AS name_b
          FROM c a JOIN c b ON a.h1 = b.h1 AND a.c_custkey < b.c_custkey
            AND levenshtein(a.c_name, b.c_name) <= 1
          UNION
          SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name
          FROM c a JOIN c b ON a.h2 = b.h2 AND a.c_custkey < b.c_custkey
            AND levenshtein(a.c_name, b.c_name) <= 1)
      SELECT key_a, key_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
      FROM cand ORDER BY key_a, key_b"""))

  /** Variable-length fuzzy join — the length-CHANGING edits (insert/delete)
    * that fixed-length blocking structurally cannot pair, served by the same
    * [[graft.operators.FuzzyJoin]] deletion-neighborhood operator as
    * `q_join_fuzzy` (recall proof and 100 TB shape in its scaladoc). The B
    * side plants a deterministic length-changing edit per part (even keys
    * delete a char, odd keys insert one) so the oracle exercises precisely
    * the insert/delete recall; both engines replay the same construction
    * and the same Wagner-Fischer verify. */
  private val joinFuzzyVarlen = Q(
    "q_join_fuzzy_varlen",
    (s, d) => {
      Tables.views(s, d, "part")
      val a = s.sql(
        """SELECT p_partkey AS key_a,
                  concat(p_name, ' #', CAST(p_partkey AS STRING)) AS name_a
           FROM part""")
      val b = s.sql("""
        WITH b0 AS (SELECT p_partkey, concat(p_name, ' #', CAST(p_partkey AS STRING)) AS k
               FROM part),
        b1 AS (SELECT p_partkey, k,
                      CAST(p_partkey % (length(k) - 2) + 2 AS INT) AS pos
               FROM b0)
        SELECT p_partkey + 1000000 AS key_b,
               CASE WHEN p_partkey % 2 = 0
                    THEN concat(substring(k, 1, pos - 1), substring(k, pos + 1))
                    ELSE concat(substring(k, 1, pos - 1), 'q', substring(k, pos))
               END AS name_b
        FROM b1""")
      graft.operators.FuzzyJoin
        .ed1(a, b, "key_a", "name_a", "key_b", "name_b")
        .select(col("key_a"), col("key_b"),
          length(col("name_a")).cast("long").as("len_a"),
          length(col("name_b")).cast("long").as("len_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .orderBy("key_a", "key_b")
    },
    Some("""WITH a AS (SELECT p_partkey AS key_a,
                   p_name || ' #' || CAST(p_partkey AS VARCHAR) AS name_a
                 FROM part),
      b0 AS (SELECT p_partkey, p_name || ' #' || CAST(p_partkey AS VARCHAR) AS k
             FROM part),
      b1 AS (SELECT p_partkey, k,
                    CAST(p_partkey % (length(k) - 2) + 2 AS INT) AS pos
             FROM b0),
      b AS (SELECT p_partkey + 1000000 AS key_b,
                   CASE WHEN p_partkey % 2 = 0
                        THEN substr(k, 1, pos - 1) || substr(k, pos + 1)
                        ELSE substr(k, 1, pos - 1) || 'q' || substr(k, pos)
                   END AS name_b
            FROM b1),
      va AS (SELECT key_a, name_a,
                    unnest(list_prepend(name_a,
                      list_transform(range(1, length(name_a) + 1),
                        i -> substr(name_a, 1, i - 1) || substr(name_a, i + 1)))) AS v
             FROM a),
      vb AS (SELECT key_b, name_b,
                    unnest(list_prepend(name_b,
                      list_transform(range(1, length(name_b) + 1),
                        i -> substr(name_b, 1, i - 1) || substr(name_b, i + 1)))) AS v
             FROM b),
      cand AS (SELECT DISTINCT key_a, key_b, name_a, name_b
               FROM va JOIN vb ON va.v = vb.v
                 AND levenshtein(va.name_a, vb.name_b) <= 1)
      SELECT key_a, key_b,
             CAST(length(name_a) AS BIGINT) AS len_a,
             CAST(length(name_b) AS BIGINT) AS len_b,
             CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
      FROM cand ORDER BY key_a, key_b"""))

  val all: Seq[Q] = Seq(
    projFilter,
    dateIntervals,
    aggGroup, aggDistinct, aggFilteredHaving, aggRollup, aggCube, aggGroupingSets,
    aggPivot, unpivotFn, aggPercentile, aggApproxPercentile, aggStats, aggApproxDistinct, aggHllMerge, aggApproxSet, aggNaryExtrema, aggArrayOrdered, aggWeightedPercentile,
    aggCollect, aggHistogram, aggMinMaxBy, aggRegr, aggBool, aggBitwise, aggMoments,
    aggMad,
    joinInner, joinLeft, joinRight, joinFull, joinCross, joinSemi, joinAnti,
    joinTheta, joinBucketed, joinFuzzy, joinFuzzyVarlen, joinLateral, joinNullsafe,
    joinStar, joinSalted,
    aggListagg, aggMultimap, aggMapUnion, aggEquiheight, aggReduce, aggEntropy,
    aggMapAgg, aggHistogramPresto, aggMultimapPresto, tryPresto,
    windowTopkPerGroup, windowLagRunsum, windowRanks, windowRange, windowDist,
    windowFrames, windowGroups, windowExclude, windowExcludeModes,
    sortTopk, sortNullsOffset,
    recursiveCte,
    setUnion, setUnionAll, setIntersect, setExcept, setIntersectAll, setExceptAll,
    condFns, condNullExtrema, stringFns, stringFns2, stringHash, regexpFns, encodingFns,
    stringNormalize, stringMetrics, stringStrpos, regexpSplit, prestoSplitRow, stringNgrams,
    encodingPresto, mathPresto,
    dateFns, dateFns2, dateTz, datePrestoFmt, dateParse, datePrestoRoundtrip,
    datePrestoIso, dateFromUnixtime,
    mathFns, mathFns2, aggApproxPresto,
    aggWidthBucket, arrayFns, arrayLambda, arraySortLambda, arrayQuantifiers, arrayNgrams,
    mapFns, mapLambda, mapParse, arrayGen, arrayZip, explodeFn, explodePos, explodeMulti,
    unnestPresto, unnestOuter, unnestOrdinality, unnestZip, unnestRows, tryFns,
    urlFns, urlExtract, bitwiseFns,
    subqueryIn, subqueryScalar, subqueryExists)
}
