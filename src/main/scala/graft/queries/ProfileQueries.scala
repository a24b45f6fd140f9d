package graft.queries

import org.apache.spark.sql.functions._
import Tables.t

/** Data-quality profiling and constraint validation — the observability
  * layer every production lake runs beside its queries (the Deequ/
  * Great-Expectations workload): per-column completeness/cardinality
  * profiles, and declarative constraints checked in bulk with violation
  * counts. The reference has no equivalent (its pipeline trusts the
  * normalization plugins); at 100 TB the profile IS the contract a
  * downstream training-data consumer reads before trusting a table.
  */
object ProfileQueries {

  /** See [[Tables.events]]. */
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)

  /** Column profile of the events table: per column, null count,
    * completeness in basis points, and exact distinct cardinality — ONE
    * corpus pass producing a 4-row result. Multi-column exact distincts
    * compile to a single Expand(×columns)+aggregate (the grouping-sets
    * machinery — corpus×4 intermediate rows, all map-side partial); at
    * 100 TB a deployment flips the exact counts to approx_count_distinct
    * and the pass becomes sketch-mergeable with the same output shape.
    * The wide 1-row aggregate is then unpivoted to (column, metric) rows
    * by a bounded stack() — presentation only, no data touched twice. */
  private val profile = Q(
    "q_profile_columns",
    (s, d) => {
      val wide = ev(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nn_user"),
        countDistinct(col("user_id")).as("nd_user"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("nn_type"),
        countDistinct(col("event_type")).as("nd_type"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("nn_value"),
        countDistinct(col("value")).as("nd_value"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("nn_props"),
        countDistinct(col("props")).as("nd_props"))
      wide.select(expr(
        """stack(4,
             'event_type', nn_type,  nd_type,
             'props',      nn_props, nd_props,
             'user_id',    nn_user,  nd_user,
             'value',      nn_value, nd_value)
           AS (column_name, n_nulls, n_distinct)"""), col("n_rows"))
        .select(col("column_name"), col("n_nulls"), col("n_distinct"),
          expr("(n_rows - n_nulls) * 10000 div n_rows").as("complete_bp"))
        .orderBy("column_name")
    },
    Some("""WITH w AS (SELECT count(*) AS n_rows,
          sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nn_user,
          count(DISTINCT user_id) AS nd_user,
          sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS nn_type,
          count(DISTINCT event_type) AS nd_type,
          sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nn_value,
          count(DISTINCT value) AS nd_value,
          sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nn_props,
          count(DISTINCT props) AS nd_props
        FROM events),
      u AS (
        SELECT 'event_type' AS column_name, nn_type AS n_nulls, nd_type AS n_distinct, n_rows FROM w
        UNION ALL SELECT 'props', nn_props, nd_props, n_rows FROM w
        UNION ALL SELECT 'user_id', nn_user, nd_user, n_rows FROM w
        UNION ALL SELECT 'value', nn_value, nd_value, n_rows FROM w)
      SELECT column_name, CAST(n_nulls AS BIGINT) AS n_nulls,
             CAST(n_distinct AS BIGINT) AS n_distinct,
             CAST((n_rows - n_nulls) * 10000 // n_rows AS BIGINT) AS complete_bp
      FROM u ORDER BY column_name"""))

  /** Declarative constraint suite over the events table — the validation
    * twin of [[profile]]: each rule is a per-row predicate aggregated to a
    * violation count in the SAME single corpus pass (conditional sums, all
    * map-side partial; adding a rule adds a column, never a scan), plus one
    * uniqueness rule which is inherently distinct-shaped and rides the same
    * aggregate via (n − distinct). Output one row per constraint with its
    * violation count and pass flag — the shape a scheduler gates a
    * downstream job on. */
  private val constraints = Q(
    "q_profile_constraints",
    (s, d) => {
      // the additive rules come from the SHARED DataQuality rule set (the
      // streaming ledger folds the same predicates — the two surfaces
      // cannot drift); uniqueness is batch-only (not mergeable without the
      // key universe) and rides the same single pass as a distinct-count
      val ruleCols = graft.operators.DataQuality.eventRules.map { case (n, p) =>
        sum(when(p, 1L).otherwise(0L)).as(n)
      }
      val wide = ev(s, d).agg(
        (count(lit(1)) - countDistinct(col("event_id"))).as("event_id_unique"),
        ruleCols: _*)
      val names =
        ("event_id_unique" +: graft.operators.DataQuality.eventRules.map(_._1)).sorted
      val stackExpr = names.map(n => s"'$n', $n")
        .mkString(s"stack(${names.size}, ", ", ", ") AS (constraint, violations)")
      wide.select(expr(stackExpr))
        .select(col("constraint"), col("violations"),
          (col("violations") === 0L).as("passed"))
        .orderBy("constraint")
    },
    Some("""WITH w AS (SELECT count(*) AS n_rows,
          sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS v_id_null,
          count(*) - count(DISTINCT event_id) AS v_id_dup,
          sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS v_val_neg,
          sum(CASE WHEN event_type NOT IN ('click','view','purchase','error','login')
                   THEN 1 ELSE 0 END) AS v_type_dom,
          sum(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS v_props_k
        FROM events),
      u AS (
        SELECT 'event_id_not_null' AS constraint, v_id_null AS violations FROM w
        UNION ALL SELECT 'event_id_unique', v_id_dup FROM w
        UNION ALL SELECT 'event_type_in_domain', v_type_dom FROM w
        UNION ALL SELECT 'props_has_k', v_props_k FROM w
        UNION ALL SELECT 'value_non_negative', v_val_neg FROM w)
      SELECT "constraint", CAST(violations AS BIGINT) AS violations,
             violations = 0 AS passed
      FROM u ORDER BY "constraint""""))

  /** Distribution drift (PSI) — the train-vs-serve monitoring staple: split
    * the corpus into a reference window and a current window (first vs
    * second half of the time range here; production compares yesterday's
    * table to today's), histogram a monitored column into FIXED integer
    * bins, and report counts, proportions, and the Population Stability
    * Index contribution per bin (a monitor sums psi_term against the
    * conventional 0.1 watch / 0.25 alert thresholds). Two aggregates over
    * the corpus (bin counts — map-side partial, with the one-row midpoint
    * frame broadcast), then all PSI math runs on the BOUNDED bin table. Bin proportions are exact integer basis points;
    * the ln-ratio factor is the one inherently-float step, computed from
    * those integer bp on both engines and rounded through decimal(24,6)
    * (the established cross-engine float discipline), with empty bins
    * Laplace-floored to 1 bp so the log never sees zero. */
  private val drift = Q(
    "q_profile_drift",
    (s, d) => {
      val e = ev(s, d)
      val mid = e.agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"))
        .select(expr("lo + (hi - lo) div 2").as("mid"))
      val binned = e.filter(col("value").isNotNull).crossJoin(broadcast(mid))
        .select(graft.operators.DataQuality.driftBin(col("value")).as("bin"),
          (unix_micros(col("ts")) <= col("mid")).as("is_ref"))
        .groupBy("bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      val tot = binned.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
      binned.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_ref"), col("n_cur"),
          greatest(expr("n_ref * 10000 div t_ref"), lit(1L)).as("ref_bp"),
          greatest(expr("n_cur * 10000 div t_cur"), lit(1L)).as("cur_bp"))
        .select(col("bin"), col("n_ref"), col("n_cur"), col("ref_bp"), col("cur_bp"),
          graft.operators.DataQuality.psiTerm(col("ref_bp"), col("cur_bp")).as("psi_term"))
        .orderBy("bin")
    },
    Some("""WITH m AS (
        SELECT epoch_us(min(ts)) + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        FROM events),
      b AS (
        SELECT least(greatest(CAST(floor(value / 20) AS BIGINT), 0), 9) AS bin,
               sum(CASE WHEN epoch_us(ts) <= m.mid THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN epoch_us(ts) > m.mid THEN 1 ELSE 0 END) AS n_cur
        FROM events, m WHERE value IS NOT NULL GROUP BY 1),
      t AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM b),
      p AS (
        SELECT bin, n_ref, n_cur,
               greatest(n_ref * 10000 // t_ref, 1) AS ref_bp,
               greatest(n_cur * 10000 // t_cur, 1) AS cur_bp
        FROM b, t)
      SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
             CAST(ref_bp AS BIGINT) AS ref_bp, CAST(cur_bp AS BIGINT) AS cur_bp,
             CAST(round(CAST((cur_bp - ref_bp) / 10000.0 *
                        ln(cur_bp / CAST(ref_bp AS DOUBLE)) AS DECIMAL(24,6)), 6)
                  AS DOUBLE) AS psi_term
      FROM p ORDER BY bin"""))

  val all: Seq[Q] = Seq(profile, constraints, drift)
}
