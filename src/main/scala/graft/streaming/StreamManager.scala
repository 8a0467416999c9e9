package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** ST6: stream lifecycle control — the collector's
  * idle→starting→running→stopping state machine with inserted-row
  * counters and last-error surfacing
  * (reference: api/collector.py:20-66; api/server.py:41-53).
  *
  * Wraps a [[StreamingQuery]]: `status()` is the JSON-shaped snapshot the
  * reference's `/collector/status` endpoint returns. The lifetime row
  * counter is fed by a [[StreamingQueryListener]] — progress EVENTS are
  * delivered for every batch regardless of how often anyone polls,
  * where the `recentProgress` ring buffer (default 100 entries) silently
  * drops history on an unmonitored stream; the poll-time drain remains
  * as a backstop, both deduplicated per batch id under one lock.
  */
final class StreamManager(name: String) {

  sealed trait State { def label: String }
  case object Idle extends State { val label = "idle" }
  case object Starting extends State { val label = "starting" }
  case object Running extends State { val label = "running" }
  case object Stopping extends State { val label = "stopping" }

  private val state = new AtomicReference[State](Idle)
  private val query = new AtomicReference[Option[StreamingQuery]](None)
  private val lastError = new AtomicReference[Option[String]](None)
  private val accumulatedRows = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lastSeenBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
  private val listener = new AtomicReference[Option[StreamingQueryListener]](None)

  // every count flows through here: one lock, monotone batch-id guard, so
  // the async listener and the poll-time backstop can never double-count
  private def record(batchId: Long, rows: Long): Unit = synchronized {
    if (batchId > lastSeenBatch.get()) {
      accumulatedRows.addAndGet(rows)
      lastSeenBatch.set(batchId)
    }
  }

  private def accumulate(): Unit = synchronized {
    query.get().foreach { q =>
      q.recentProgress
        .filter(_.batchId > lastSeenBatch.get())
        .sortBy(_.batchId)
        .foreach(p => record(p.batchId, p.numInputRows))
    }
  }

  /** Reap a query that died or completed on its own: surface its error,
    * drain its counters, release it, detach the listener, return to
    * Idle. Runs from every public entry point so the state machine can
    * never get stuck at Running on a dead query. */
  private def reapIfDead(): Unit = synchronized {
    query.get().foreach { q =>
      if (!q.isActive && (state.get() == Running || state.get() == Starting)) {
        Option(q.exception).flatten.foreach(e =>
          lastError.set(Some(e.toString)))
        accumulate()
        detachListener(q)
        state.set(Idle)
        query.set(None)
      }
    }
  }

  private def attachListener(q: StreamingQuery): Unit = {
    // match on runId, not id: id is persisted in the checkpoint and thus
    // IDENTICAL across restarts, so a stale progress event from the
    // previous query instance still queued on the async listener bus
    // would pass an id check after start() reset lastSeenBatch and be
    // counted twice; runId is unique per execution
    val rid = q.runId
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.runId == rid)
          record(e.progress.batchId, e.progress.numInputRows)
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    q.sparkSession.streams.addListener(l)
    listener.set(Some(l))
  }

  private def detachListener(q: StreamingQuery): Unit = {
    listener.getAndSet(None).foreach(q.sparkSession.streams.removeListener)
  }

  /** Start via the supplied launcher (reference: collector start endpoint,
    * api/collector.py:20-41). No-op if a query is actively running; a
    * query that already died is reaped first so a restart is possible
    * without an intervening status poll. */
  def start(launch: () => StreamingQuery): this.type = synchronized {
    reapIfDead()
    if (state.get() == Idle) {
      state.set(Starting)
      try {
        // a fresh launch's batch ids may restart at 0 (new checkpoint);
        // the previous query's entries were already drained at stop/reap
        lastSeenBatch.set(-1L)
        val q = launch()
        query.set(Some(q))
        attachListener(q)
        state.set(Running)
        lastError.set(None)
      } catch {
        case e: Exception =>
          lastError.set(Some(e.toString))
          state.set(Idle)
      }
    }
    this
  }

  /** ST7: start with bounded restart-on-FAILURE. The reference's WS loop
    * surfaces errors to status with no auto-retry
    * (api/collector.py:120-126); Structured Streaming does better — a
    * relaunched query resumes from its checkpoint, so restarts are safe
    * and lossless. Retries only while an error is recorded: a query that
    * ran to successful completion (e.g. `Trigger.AvailableNow` draining
    * its input) also lands at Idle but must NOT be relaunched. */
  // serializes CONCURRENT startWithRetry callers without holding the
  // instance monitor: the retry loop waits out graceMs per attempt, and
  // the monitor is what the progress LISTENER takes per batch — holding
  // it across the waits would block a shared listener-bus dispatch
  // thread (and every status poll) for up to (retries+1)·graceMs
  private val retryLock = new java.util.concurrent.locks.ReentrantLock()

  def startWithRetry(launch: () => StreamingQuery,
                     maxRetries: Int = 3,
                     graceMs: Long = 2000): this.type = {
    // Startup failure is ASYNCHRONOUS: launch() hands back a live query
    // that can die milliseconds later (socket connect refused, bad
    // path), which a same-instant state poll would still see as
    // running. Wait out `graceMs` for termination after each launch so
    // those failures are observed — and retried — here rather than
    // discovered dead by the next status poll with no retry left.
    def awaitEarlyFailure(): Unit = query.get().foreach { q =>
      try q.awaitTermination(graceMs)
      catch { case _: Exception => () } // cause surfaced via q.exception
    }
    retryLock.lock()
    try {
      var attempts = 0
      start(launch) // takes the instance monitor only per call
      awaitEarlyFailure()
      while (currentState == "idle" && lastError.get().isDefined &&
          attempts < maxRetries) {
        attempts += 1
        start(launch)
        awaitEarlyFailure()
      }
    } finally retryLock.unlock()
    this
  }

  /** Graceful stop — processes the in-flight batch first (the reference's
    * shutdown flush, src/stream_binance.py:116-119). */
  def stop(): this.type = synchronized {
    query.get().foreach { q =>
      state.set(Stopping)
      try q.stop()
      catch { case e: Exception => lastError.set(Some(e.toString)) }
      // a query that had already DIED carries the real failure cause —
      // surface it (overwriting any secondary stop() error) exactly
      // like reapIfDead would have, or the crash reports a clean idle
      Option(q.exception).flatten.foreach(e => lastError.set(Some(e.toString)))
      // drain AFTER the stop: the in-flight batch completes during the
      // graceful stop and its rows must make the lifetime counter
      accumulate()
      detachListener(q)
      query.set(None)
      state.set(Idle)
    }
    this
  }

  /** Total input rows across the manager's lifetime — survives query
    * completion and restarts (reference's persistent `inserted_rows`
    * counter, api/collector.py:30-41). */
  def insertedRows: Long = {
    accumulate()
    accumulatedRows.get()
  }

  def currentState: String = {
    // A query that died on its own (source failure) surfaces as idle +
    // error, matching the reference's error path (api/collector.py:120-126).
    reapIfDead()
    state.get().label
  }

  /** Status snapshot (reference: api/server.py:41-53). */
  def status: Map[String, Any] = Map(
    "name" -> name,
    "state" -> currentState,
    "inserted_rows" -> insertedRows,
    "last_flush" -> query.get().flatMap(q =>
      Option(q.lastProgress).map(_.timestamp)).orNull,
    "last_error" -> lastError.get().orNull)
}
