package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}
import Tables.events

/** Temporal join surface: as-of ("state as of the event") and bounded-range
  * ("what followed within N minutes") joins over the events stream table.
  *
  * The reference delegates ad-hoc SQL to Presto (reference README.md:116),
  * where both shapes need correlated subqueries or unbounded inequality
  * joins; here each is a dedicated operator with a plan that survives 100 TB
  * (see [[graft.operators.AsOfJoin]] / [[graft.operators.RangeJoin]] scale
  * notes). Both are oracle-checked against an INDEPENDENT DuckDB
  * implementation of the same semantics: native `ASOF LEFT JOIN` (DuckDB's
  * own sorted-merge asof operator) and its IEJoin inequality join.
  */
object TemporalQueries {

  /** For each purchase, the latest click by the same user at or before the
    * purchase (attribution). Plan: union + one shuffle + window — NO Join
    * node (pinned in PlansSpec); DuckDB oracle uses native ASOF LEFT JOIN. */
  private val asof = Q(
    "q_join_asof",
    (s, d) => {
      val e = events(s, d)
      val purchases = e
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = e
        .filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      AsOfJoin
        .backward(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("ts", "value"), prefix = "c_")
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          unix_micros(col("c_ts")).as("c_us"),
          col("value").as("p_value"),
          col("c_value"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts AS c_ts, value AS c_value FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c_ts) AS c_us,
             p.value AS p_value, c_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.c_ts
      ORDER BY event_id"""))

  /** Event pairs by the same user within 2 hours (forward-looking, exclusive
    * of ties): interval-binned equi-join — never BNLJ (pinned in PlansSpec).
    * DuckDB evaluates the same semantics as a raw inequality join (IEJoin). */
  private val range = Q(
    "q_join_range",
    (s, d) => {
      val gapUs = 7200L * 1000000L
      val e = events(s, d).withColumn("us", unix_micros(col("ts")))
      val a = e.select(col("event_id").as("id"), col("user_id"), col("us"))
      val b = e.select(col("event_id").as("id"), col("user_id"), col("us"))
      RangeJoin
        .pairsWithin(a, b, Seq("user_id"), "us", "us", gapUs)
        .select(
          col("a_id"),
          col("b_id"),
          col("user_id"),
          (col("b_us") - col("a_us")).as("gap_us"))
        .orderBy("a_id", "b_id")
    },
    Some("""SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
             epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND b.ts > a.ts
       AND epoch_us(b.ts) - epoch_us(a.ts) <= 7200000000
      ORDER BY a_id, b_id"""))

  /** Forward as-of: each signup matched to the user's NEXT purchase (time
    * to convert). Same join-free union+shuffle+window operator as
    * `q_join_asof`, mirrored to the FOLLOWING frame
    * ([[graft.operators.AsOfJoin.forward]]); the oracle is DuckDB's native
    * forward `ASOF LEFT JOIN` (`l.ts <= r.ts`) — an independent algorithm
    * for the same contract, ties inclusive on both sides. */
  private val asofForward = Q(
    "q_join_asof_forward",
    (s, d) => {
      val e = events(s, d)
      val signups = e
        .filter(col("event_type") === "signup")
        .select("event_id", "user_id", "ts")
      val purchases = e
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOfJoin
        .forward(signups, purchases, Seq("user_id"), "ts", "ts", Seq("ts", "value"), prefix = "p_")
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("s_us"),
          unix_micros(col("p_ts")).as("p_us"),
          (unix_micros(col("p_ts")) - unix_micros(col("ts"))).as("wait_us"),
          col("p_value"))
        .orderBy("event_id")
    },
    Some("""WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
           p AS (SELECT user_id, ts AS p_ts, value AS p_value FROM events WHERE event_type = 'purchase')
      SELECT s.event_id, s.user_id, epoch_us(s.ts) AS s_us, epoch_us(p_ts) AS p_us,
             epoch_us(p_ts) - epoch_us(s.ts) AS wait_us, p_value
      FROM s ASOF LEFT JOIN p ON s.user_id = p.user_id AND s.ts <= p.p_ts
      ORDER BY event_id"""))

  val all: Seq[Q] = Seq(asof, range, asofForward)
}
