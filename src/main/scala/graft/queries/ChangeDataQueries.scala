package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.t

/** Change-data-capture and slow-changing-dimension maintenance — the
  * warehouse upkeep operators a lake engine runs between queries. The
  * reference's lake is append-only (Firehose partitions,
  * `/root/reference/lambdas/generate_partitions.py`), but any consumer
  * that mirrors a mutable source table into it needs MERGE semantics, and
  * any dimension mirrored over time needs SCD2 history — both are plain
  * relational plans in Spark (windowed compaction + one full-outer join;
  * gaps-and-islands), no Delta/Hudi runtime required.
  */
object ChangeDataQueries {

  /** CDC MERGE (upsert-apply): compact a multi-version changelog to
    * latest-per-key, then apply it to a base snapshot — MERGE WHEN MATCHED
    * UPDATE / WHEN NOT MATCHED INSERT / WHEN MATCHED AND op='D' DELETE,
    * expressed as one windowed dedup plus one full-outer join. Base and
    * changelog are both derived from `orders` by deterministic key
    * arithmetic (base = keys not ≡0 mod 4; the log inserts the mod-4
    * complement, updates mod-3 twice at increasing seq, deletes mod-13),
    * so both engines construct the identical inputs and a wrong
    * latest-wins or wrong join side cannot cancel out. Scale shape: the
    * changelog compaction is one hash shuffle on the key with
    * WindowGroupLimit-able row_number; the apply is one co-partitioned
    * full-outer join on the same key — at 100 TB the snapshot is bucketed
    * by key and the delta (always ≪ snapshot) shuffles to it; nothing is
    * ever collected or cross-joined. */
  /** The deterministic CDC inputs, shared by the declared row and the
    * [[graft.operators.SnapshotStore]] spec pins (incremental == one-shot
    * needs both to derive the IDENTICAL base and changelog). */
  private[graft] def cdcOrders(
      s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("decimal(18,2)").as("price"))

  private[graft] def cdcBase(s: org.apache.spark.sql.SparkSession, d: String) =
    cdcOrders(s, d).filter(col("o_orderkey") % 4 =!= 0)

  private[graft] def cdcChangelog(s: org.apache.spark.sql.SparkSession, d: String) = {
    val o = cdcOrders(s, d)
    o.filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"), lit("I").as("op"), col("price"), lit(1L).as("seq"))
      .unionAll(o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("U").as("op"),
          (col("price") + 10).cast("decimal(18,2)").as("price"), lit(2L).as("seq")))
      .unionAll(o.filter(col("o_orderkey") % 6 === 0)
        .select(col("o_orderkey"), lit("U").as("op"),
          (col("price") + 20).cast("decimal(18,2)").as("price"), lit(3L).as("seq")))
      .unionAll(o.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), lit("D").as("op"), col("price"), lit(4L).as("seq")))
  }

  private val cdcUpsert = Q(
    "q_cdc_upsert",
    (s, d) => {
      val base = cdcBase(s, d).withColumn("in_base", lit(1))
      val chg = cdcChangelog(s, d)
      val latest = chg
        .withColumn("rn",
          row_number().over(Window.partitionBy("o_orderkey").orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .drop("rn", "seq")
      base.as("b")
        .join(latest.as("c"), Seq("o_orderkey"), "full_outer")
        .filter(!(col("c.op") <=> lit("D")))
        .select(
          col("o_orderkey"),
          coalesce(col("c.price"), col("b.price")).cast("double").as("price"),
          when(col("c.op").isNull, lit("kept"))
            .when(col("b.in_base").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("src"))
        .orderBy("o_orderkey")
    },
    Some("""WITH o AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
      base AS (SELECT o_orderkey, price, 1 AS in_base FROM o WHERE o_orderkey % 4 <> 0),
      chg AS (
        SELECT o_orderkey, 'I' AS op, price, 1 AS seq FROM o WHERE o_orderkey % 4 = 0
        UNION ALL SELECT o_orderkey, 'U', CAST(price + 10 AS DECIMAL(18,2)), 2 FROM o WHERE o_orderkey % 3 = 0
        UNION ALL SELECT o_orderkey, 'U', CAST(price + 20 AS DECIMAL(18,2)), 3 FROM o WHERE o_orderkey % 6 = 0
        UNION ALL SELECT o_orderkey, 'D', price, 4 FROM o WHERE o_orderkey % 13 = 0),
      latest AS (SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
          FROM chg) WHERE rn = 1),
      merged AS (
        SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
               COALESCE(c.price, b.price) AS price,
               CASE WHEN c.op IS NULL THEN 'kept'
                    WHEN b.in_base IS NULL THEN 'inserted' ELSE 'updated' END AS src,
               c.op AS op
        FROM base b FULL OUTER JOIN latest c ON b.o_orderkey = c.o_orderkey)
      SELECT o_orderkey, CAST(price AS DOUBLE) AS price, src
      FROM merged WHERE op IS DISTINCT FROM 'D'
      ORDER BY o_orderkey"""))

  /** SCD type-2 history build: collapse each user's event-type stream into
    * validity intervals [valid_from, valid_to) via gaps-and-islands — a
    * change mark from lag(), a running sum to number the islands, one
    * aggregate per island, and lead() to close each interval (open
    * intervals read 'current'). The island arithmetic is the canonical
    * windowed form: per-user ordered windows only — NO self-join, NO
    * global sort; at 100 TB every window partitions on user_id (one hash
    * shuffle) and each user's history sorts independently, so skew is
    * bounded by the busiest single user. Ordering ties on ts break by
    * event_id so both engines see one canonical sequence. */
  private val scd2 = Q(
    "q_scd2",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val marks = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("chg",
          when(!(lag("event_type", 1).over(w) <=> col("event_type")), 1L).otherwise(0L))
      val grp = marks.withColumn("version",
        sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val runs = grp.groupBy("user_id", "event_type", "version")
        .agg(min("ts").as("valid_from"), count(lit(1)).as("n_events"))
      val wv = Window.partitionBy("user_id").orderBy("version")
      runs
        .withColumn("valid_to_ts", lead("valid_from", 1).over(wv))
        .select(
          col("user_id"), col("version"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          coalesce(date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss"), lit("current"))
            .as("valid_to"),
          col("n_events"))
        .orderBy("user_id", "version")
    },
    Some("""WITH marks AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      grp AS (
        SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        FROM marks),
      runs AS (
        SELECT user_id, event_type, version, min(ts) AS valid_from,
               count(*) AS n_events
        FROM grp GROUP BY 1, 2, 3)
      SELECT user_id, version, event_type,
             strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
             COALESCE(strftime(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
                               '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
             n_events
      FROM runs ORDER BY user_id, version"""))

  val all: Seq[Q] = Seq(cdcUpsert, scd2)
}
