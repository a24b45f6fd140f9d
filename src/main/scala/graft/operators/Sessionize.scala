package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state operator family the
  * reference's query surface can't reach with plain windows (SURVEY §2B
  * streaming row; `mapGroupsWithState`/`flatMapGroupsWithState`).
  *
  * A session is a maximal run of one user's events where consecutive gaps
  * are <= `gapSeconds`. Batch and streaming share the same session algebra;
  * the batch form is oracle-checked against the relational islands
  * formulation (lag + running sum of breaks) in DuckDB.
  *
  * Scale: one shuffle on user_id (high cardinality, AQE handles skew);
  * per-group work is a linear scan of that user's events. Streaming state
  * is one small record per open session, reaped by event-time timeout.
  */
object Sessionize {

  final case class UserEvent(user_id: Long, ts_micros: Long)
  final case class Session(user_id: Long, session_start_micros: Long, n_events: Long, duration_s: Long)
  /** Streaming state record — public: the state encoder's generated code
    * needs accessible accessors/constructor. */
  final case class OpenSession(start: Long, last: Long, n: Long)

  private def sessionsOf(gapMicros: Long, events: Iterator[UserEvent]): Iterator[Session] = {
    val sorted = events.toArray.sortBy(_.ts_micros)
    val out = Vector.newBuilder[Session]
    var open: Option[OpenSession] = None
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_micros - s.last <= gapMicros =>
          open = Some(s.copy(last = e.ts_micros, n = s.n + 1))
        case Some(s) =>
          out += Session(0L, s.start, s.n, (s.last - s.start) / 1000000L)
          open = Some(OpenSession(e.ts_micros, e.ts_micros, 1))
        case None =>
          open = Some(OpenSession(e.ts_micros, e.ts_micros, 1))
      }
    }
    open.foreach(s => out += Session(0L, s.start, s.n, (s.last - s.start) / 1000000L))
    out.result().iterator
  }

  /** Batch sessionization over (user_id, ts) rows. */
  def sessionize(df: DataFrame, gapSeconds: Long): Dataset[Session] = {
    val spark = df.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    df.select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_micros"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        sessionsOf(gapMicros, it).map(_.copy(user_id = uid))
      }
  }

  /** Streaming sessionization: one open-session state per user, emitted when
    * the event-time watermark passes last_event + gap (EventTimeTimeout).
    * Late events beyond the watermark are dropped by the upstream watermark;
    * within it, out-of-order events extend the open session conservatively. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long, watermark: String = "10 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L

    def update(uid: Long, it: Iterator[(Long, java.sql.Timestamp)], state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(uid, s.start, s.n, (s.last - s.start) / 1000000L))
      } else {
        val batch = it.map { case (_, ts) =>
          UserEvent(uid, ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
        }.toArray.sortBy(_.ts_micros)
        val closed = Vector.newBuilder[Session]
        var open = state.getOption
        batch.foreach { e =>
          open match {
            case Some(s) if e.ts_micros - s.last <= gapMicros =>
              open = Some(s.copy(last = e.ts_micros, n = s.n + 1))
            case Some(s) =>
              closed += Session(uid, s.start, s.n, (s.last - s.start) / 1000000L)
              open = Some(OpenSession(e.ts_micros, e.ts_micros, 1))
            case None =>
              open = Some(OpenSession(e.ts_micros, e.ts_micros, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last / 1000L + gapSeconds * 1000L)
        }
        closed.result().iterator
      }
    }

    // the watermarked ts column must reach the stateful operator itself —
    // projecting it away upstream would drop the watermark
    events
      .select(col("user_id").cast("long"), col("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
