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
object Sessionize extends Serializable {

  final case class UserEvent(user_id: Long, ts_micros: Long)
  final case class Session(user_id: Long, session_start_micros: Long, n_events: Long, duration_s: Long)
  /** Streaming state record — public: the state encoder's generated code
    * needs accessible accessors/constructor. */
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** The one session fold both batch and streaming use: sorted timestamps
    * against an optional carried-over open session. A merged event may be
    * EARLIER than the open session's bounds (a late-but-in-watermark event in
    * a later micro-batch), so bounds move via min/max — never backward.
    *
    * Late events more than a gap BEFORE the carried session's start can
    * never belong to it (batch reprocessing would put a session break
    * between them): they are chained among themselves and emitted as their
    * own closed session(s) instead of being absorbed — without this split,
    * `ts - s.last <= gap` is vacuously true for any earlier event. The
    * earlier chain closes immediately: its last event is > gap away from the
    * carried session's start by construction, and the carried state can hold
    * only one open session.
    *
    * PINNED DEVIATION from batch replay (OperatorsSpec "pre-session late
    * chains emit eagerly"): because the chain closes at the end of its
    * micro-batch, a STILL-LATER in-watermark event within a gap of it — one
    * batch replay would merge into the same session — arrives after the
    * emit and starts a fresh session. Buffering pre-session chains in state
    * until the watermark passes would restore exact replay parity at the
    * cost of a multi-session state record and per-chain timeout bookkeeping;
    * eager emit keeps state one record per user, and the split only occurs
    * for events already later than the watermark-bounded reorder window
    * spread across distinct micro-batches. */
  private[graft] def fold(
      gapMicros: Long,
      init: Option[OpenSession],
      sorted: Array[Long]): (Vector[OpenSession], Option[OpenSession]) = {
    init match {
      case Some(s) =>
        val cut = {
          val i = sorted.indexWhere(_ >= s.start - gapMicros)
          if (i == -1) sorted.length else i
        }
        val (closedBefore, openBefore) = foldChain(gapMicros, None, sorted.take(cut))
        val (closedMain, openMain) = foldChain(gapMicros, Some(s), sorted.drop(cut))
        (closedBefore ++ openBefore.toVector ++ closedMain, openMain)
      case None => foldChain(gapMicros, None, sorted)
    }
  }

  private def foldChain(
      gapMicros: Long,
      init: Option[OpenSession],
      sorted: Array[Long]): (Vector[OpenSession], Option[OpenSession]) = {
    val closed = Vector.newBuilder[OpenSession]
    var open = init
    sorted.foreach { ts =>
      open match {
        case Some(s) if ts - s.last <= gapMicros =>
          open = Some(OpenSession(math.min(s.start, ts), math.max(s.last, ts), s.n + 1))
        case Some(s) =>
          closed += s
          open = Some(OpenSession(ts, ts, 1))
        case None =>
          open = Some(OpenSession(ts, ts, 1))
      }
    }
    (closed.result(), open)
  }

  private def toSession(uid: Long, s: OpenSession): Session =
    Session(uid, s.start, s.n, (s.last - s.start) / 1000000L)

  private def sessionsOf(gapMicros: Long, events: Iterator[UserEvent]): Iterator[Session] = {
    val (closed, open) = fold(gapMicros, None, events.map(_.ts_micros).toArray.sorted)
    (closed.iterator ++ open.iterator).map(toSession(0L, _))
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
          ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
        }.toArray.sorted
        val (closed, open) = fold(gapMicros, state.getOption, batch)
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last / 1000L + gapSeconds * 1000L)
        }
        closed.iterator.map(toSession(uid, _))
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
