package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.streaming.StreamingQuery

/** ST6: stream lifecycle control — the collector's
  * idle→starting→running→stopping state machine with inserted-row
  * counters and last-error surfacing
  * (reference: api/collector.py:20-66; api/server.py:41-53).
  *
  * Wraps a [[StreamingQuery]]: `status()` is the JSON-shaped snapshot the
  * reference's `/collector/status` endpoint returns; counters come from
  * the query's progress stream rather than hand-maintained tallies.
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
  // cumulative row counter: recentProgress is a bounded ring buffer
  // (spark.sql.streaming.numRecentProgressUpdates, default 100), so a
  // lifetime count must accumulate as entries are observed
  private val accumulatedRows = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lastSeenBatch = new java.util.concurrent.atomic.AtomicLong(-1L)

  // synchronized: the read-filter-add over two atomics is not atomic on
  // its own, and status() is exactly the kind of endpoint two threads
  // poll concurrently — unsynchronized, both would count the same
  // progress entries
  private def accumulate(): Unit = synchronized {
    query.get().foreach { q =>
      q.recentProgress
        .filter(_.batchId > lastSeenBatch.get())
        .sortBy(_.batchId)
        .foreach { p =>
          accumulatedRows.addAndGet(p.numInputRows)
          lastSeenBatch.set(p.batchId)
        }
    }
  }

  /** Start via the supplied launcher (reference: collector start endpoint,
    * api/collector.py:20-41). No-op if already running. */
  def start(launch: () => StreamingQuery): this.type = synchronized {
    if (state.get() == Idle) {
      state.set(Starting)
      try {
        // a fresh launch's batch ids may restart at 0 (new checkpoint);
        // the previous query's entries were already drained at stop
        lastSeenBatch.set(-1L)
        query.set(Some(launch()))
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

  /** ST7: start with bounded restart-on-failure. The reference's WS loop
    * surfaces errors to status with no auto-retry
    * (api/collector.py:120-126); Structured Streaming does better — a
    * relaunched query resumes from its checkpoint, so restarts are safe
    * and lossless. Retries launch failures up to `maxRetries` times,
    * recording each error; gives up to Idle + last_error after that. */
  def startWithRetry(launch: () => StreamingQuery,
                     maxRetries: Int = 3): this.type = synchronized {
    var attempts = 0
    start(launch)
    while (currentState == "idle" && attempts < maxRetries) {
      attempts += 1
      start(launch)
    }
    this
  }

  /** Graceful stop — processes the in-flight batch first (the reference's
    * shutdown flush, src/stream_binance.py:116-119). */
  def stop(): this.type = synchronized {
    query.get().foreach { q =>
      state.set(Stopping)
      try q.stop()
      catch { case e: Exception => lastError.set(Some(e.toString)) }
      // drain AFTER the stop: the in-flight batch completes during the
      // graceful stop and its rows must make the lifetime counter
      accumulate()
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
    query.get().foreach { q =>
      if (!q.isActive && state.get() == Running) {
        Option(q.exception).flatten.foreach(e => lastError.set(Some(e.toString)))
        accumulate()
        state.set(Idle)
        query.set(None)
      }
    }
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
