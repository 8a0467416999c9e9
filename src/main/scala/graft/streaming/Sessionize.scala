package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event on the sessionization stream (event time `ts`). */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** Mutable-per-user session state held by the state store. */
final case class OpenSession(sid: Long, startUs: Long, lastUs: Long, n: Long)

/** One closed session — the streaming twin of the batch `per_session`
  * stage in `graft.queries.EventQueries.sessionization`. */
final case class ClosedSession(
    user_id: Long, sid: Long, n_events: Long, duration_sec: Double)

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` member of the streaming surface (the
  * watermarked-window and dropDuplicates members live in
  * [[CandlePipeline]] / the ingest tests). The gap rule matches the batch
  * query: a >30-minute silence closes the session; `sid` numbers each
  * user's sessions 1, 2, … in time order, so output rows equal the batch
  * formulation's `(user_id, sid, n_events, duration_sec)` exactly.
  *
  * Scale shape: state is ONE small record per user, partitioned by
  * user_id — the state store shards with the shuffle, no skew
  * (near-unique key). Event-time timeouts EMIT an idle user's open
  * session once the watermark passes the gap and shrink its state to an
  * O(1) tombstone carrying only the session counter — the counter must
  * survive eviction or a returning user's sids would restart at 1 and
  * collide with already-emitted rows (batch parity requires monotone
  * sids). State is therefore one open-session record per ACTIVE user
  * plus one counter-tombstone per idle user ever seen — the same
  * cardinality class as any per-user aggregate.
  *
  * Ordering contract: events for a user must arrive in event-time order
  * ACROSS micro-batches (within a batch they are sorted here). A late
  * event that still falls inside the open session's gap extends the
  * session in BOTH directions (it bumps the count and can pull
  * `startUs` earlier, lengthening the emitted duration); the batch
  * query is the exact-order reference.
  */
object Sessionize {

  /** 30 minutes, lockstep with the batch gap rule. */
  val GapUs: Long = 1800000000L

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def close(user: Long, s: OpenSession): ClosedSession =
    ClosedSession(user, s.sid, s.n, (s.lastUs - s.startUs) / 1000000.0)

  private def step(
      user: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // the watermark passed lastUs + gap with no new events: the open
      // session can never be extended — emit it, keep only the sid
      // counter (n = 0 marks "no open session"); no new timeout, so the
      // tombstone is never re-delivered here
      val out = state.getOption.filter(_.n > 0L).map { s =>
        state.update(s.copy(n = 0L))
        close(user, s)
      }
      out.iterator
    } else {
      val sorted = events.map(e => micros(e.ts)).toArray.sorted
      val out = ListBuffer.empty[ClosedSession]
      var st = state.getOption
      sorted.foreach { us =>
        st match {
          case None =>
            st = Some(OpenSession(1L, us, us, 1L))
          case Some(s) if s.n == 0L => // returning after timeout eviction
            st = Some(OpenSession(s.sid + 1L, us, us, 1L))
          case Some(s) if us - s.lastUs > GapUs =>
            out += close(user, s)
            st = Some(OpenSession(s.sid + 1L, us, us, 1L))
          case Some(s) =>
            st = Some(s.copy(
              startUs = math.min(s.startUs, us),
              lastUs = math.max(s.lastUs, us),
              n = s.n + 1L))
        }
      }
      st.foreach { s =>
        state.update(s)
        if (s.n > 0L)
          // fire once the watermark proves no in-gap event can arrive —
          // CEIL to millis: flooring would let the timeout fire up to
          // 999 µs early and split a session an exactly-at-gap event
          // would still extend
          state.setTimeoutTimestamp((s.lastUs + GapUs + 999L) / 1000L)
      }
      out.iterator
    }
  }

  /** STREAMING-ONLY core (hence private): on a batch Dataset the
    * timeouts never fire, so every user's final open session would be
    * silently dropped — batch callers use the exact lag/running-sum
    * formulation (`EventQueries.sessionization`) instead. */
  private def sessions(events: Dataset[SessionEvent]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** Streaming entry: watermark + stateful sessionization. Lateness is
    * bounded by the gap: with lateness > gap, a late event from BEFORE
    * an open session's start could pass the watermark yet precede the
    * session by more than the gap, and the forward-only gap rule would
    * merge what the batch formulation splits. */
  def sessionsWithWatermark(events: Dataset[SessionEvent],
                            latenessMinutes: Int = 10)
      : Dataset[ClosedSession] = {
    require(latenessMinutes.toLong * 60000000L <= GapUs,
      s"lateness ($latenessMinutes min) must not exceed the session gap " +
        s"(${GapUs / 60000000L} min)")
    import events.sparkSession.implicits._
    sessions(events.withWatermark("ts", s"$latenessMinutes minutes")
      .as[SessionEvent])
  }

  /** The same gap sessions through Spark's NATIVE `session_window`
    * aggregation — the built-in operator the custom
    * `flatMapGroupsWithState` path should be preferred over whenever its
    * semantics suffice (Spark-first rule): windows merge on overlap, the
    * state store holds one open window per (user, session), and append
    * mode emits a session once the watermark passes `last event + gap`.
    * What it CANNOT express (why the custom path exists): monotone
    * per-user session NUMBERS across emissions — the native operator
    * identifies sessions by start time only. Emits
    * (user_id, n_events, duration_sec, session_start). */
  def sessionsNativeWindow(
      events: Dataset[SessionEvent],
      latenessMinutes: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    events.withWatermark("ts", s"$latenessMinutes minutes")
      .groupBy(
        // express the gap in MICROseconds — a "minutes" rendering would
        // silently truncate any future non-whole-minute GapUs
        session_window(col("ts"), s"$GapUs microseconds"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          / 1000000.0).as("duration_sec"))
      .select(col("user_id"), col("n_events"), col("duration_sec"),
        col("session_window.start").as("session_start"))
  }
}
