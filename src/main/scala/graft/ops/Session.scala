package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — gap-based session windows over the event stream.
  *
  * Two implementations, cross-checked in SessionSpec:
  *
  * 1. `sessionWindows`: the built-in `session_window(ts, gap)` aggregation —
  *    Catalyst-native, works identically in batch and Structured Streaming
  *    (merging windows via the session-window state store), one keyed
  *    shuffle. This is the production path.
  *
  * 2. `sessionizeWithState`: the same semantics hand-built on
  *    `flatMapGroupsWithState` — the custom-state escape hatch for session
  *    logic the built-in can't express (e.g. value-dependent gaps, session
  *    caps). In batch each group is processed once with no state; in
  *    streaming the state carries open sessions across micro-batches with
  *    event-time timeouts.
  *
  * Session end follows Spark's convention: last event + gap.
  */
object Session extends Serializable {

  /** Built-in session windows: per key, windows that extend while events
    * arrive within `gap` of the previous one.
    */
  def sessionWindows(events: DataFrame, key: String, ts: String,
                     gap: String): DataFrame =
    events
      .groupBy(col(key), session_window(col(ts), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col(key), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"),
        col("session_value"))
  // no terminal sort: the same transform must run under streaming append
  // mode, where sorting is unsupported — batch callers order the output

  final case class Ev(userId: Long, tsMicros: Long, value: Double)
  final case class Sess(userId: Long, startMicros: Long, endMicros: Long,
                        nEvents: Long, sessionValue: Double)

  /** Custom-state sessionization, BATCH form — same output as
    * `sessionWindows` with explicit session logic. Each group is processed
    * once with the whole group in the iterator (per-key volume, not corpus
    * volume); state is cleared, so this function is NOT streaming-correct
    * (a session spanning micro-batches would be emitted twice) — streaming
    * callers use `sessionizeStream` below.
    */
  def sessionizeWithState(events: Dataset[Ev], gapMicros: Long): Dataset[Sess] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[List[Ev], Sess](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[List[Ev]]) =>
          val sorted = (state.getOption.getOrElse(Nil) ++ it.toList)
            .sortBy(e => (e.tsMicros, e.value))
          state.remove()
          if (sorted.isEmpty) Iterator.empty
          else {
            val out = scala.collection.mutable.ListBuffer[Sess]()
            var start = sorted.head.tsMicros
            var last = start
            var n = 0L
            var v = 0.0
            sorted.foreach { e =>
              // Spark session_window convention (verified in SessionSpec):
              // an event at exactly last + gap still MERGES — only a
              // strictly larger gap starts a new session
              if (n > 0 && e.tsMicros - last > gapMicros) {
                out += Sess(userId, start, last + gapMicros, n,
                  math.round(v * 100) / 100.0)
                start = e.tsMicros; n = 0; v = 0.0
              }
              last = e.tsMicros; n += 1; v += e.value
            }
            out += Sess(userId, start, last + gapMicros, n,
              math.round(v * 100) / 100.0)
            out.iterator
          }
      }
  }

  /** Streaming event with a real timestamp column (watermarkable). */
  final case class SEv(userId: Long, ts: java.sql.Timestamp, value: Double)

  /** Exact Timestamp → epoch micros. `getTime` alone is MILLIS — on a
    * micro-precision corpus the truncation silently merges/splits
    * sessions differently from the built-in (caught by the TWS
    * batch-equality spec); the sub-millisecond micros live in getNanos.
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Custom-state sessionization, STREAMING form: open sessions persist in
    * GroupState across micro-batches; a session is emitted (Append mode)
    * only once the event-time watermark passes its end, either because new
    * events for the key arrive or via the event-time timeout. Caller must
    * `withWatermark("ts", ...)` upstream.
    *
    * Closing rule: a session with end == watermark can still be extended
    * (an event at exactly last+gap merges, and events at ts >= watermark
    * are still admissible), so only sessions with end < watermark close.
    */
  /** Gap-split a (sorted, nonempty) per-key event buffer into sessions —
    * the shared close logic of [[sessionizeStream]] and [[sessionizeTws]].
    */
  private def gapSplit(sorted: List[Ev], gapMicros: Long): List[Sess] = {
    val out = scala.collection.mutable.ListBuffer[Sess]()
    var start = sorted.head.tsMicros
    var last = start; var n = 0L; var v = 0.0
    sorted.foreach { e =>
      if (n > 0 && e.tsMicros - last > gapMicros) {
        out += Sess(sorted.head.userId, start, last + gapMicros, n,
          math.round(v * 100) / 100.0)
        start = e.tsMicros; n = 0; v = 0.0
      }
      last = e.tsMicros; n += 1; v += e.value
    }
    out += Sess(sorted.head.userId, start, last + gapMicros, n,
      math.round(v * 100) / 100.0)
    out.toList
  }

  def sessionizeStream(events: Dataset[SEv], gapMicros: Long): Dataset[Sess] = {
    import events.sparkSession.implicits._
    def split(sorted: List[Ev]): List[Sess] = gapSplit(sorted, gapMicros)

    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[List[Ev], Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[SEv], state: GroupState[List[Ev]]) =>
          val incoming = it.map(e =>
            Ev(userId, micros(e.ts), e.value)).toList
          val buffered = state.getOption.getOrElse(Nil) ++ incoming
          if (buffered.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val sessions = split(buffered.sortBy(e => (e.tsMicros, e.value)))
            val (closed, open) = sessions.partition(_.endMicros < wmMicros)
            if (open.isEmpty) state.remove()
            else {
              // keep the raw events of still-open sessions; wake up when
              // the watermark passes the earliest open session end
              val openStart = open.map(_.startMicros).min
              state.update(buffered.filter(_.tsMicros >= openStart))
              state.setTimeoutTimestamp(open.map(_.endMicros).min / 1000L + 1L)
            }
            closed.iterator
          }
      }
  }

  /** The SAME streaming sessionizer on Spark 4's `transformWithState` —
    * the arbitrary-state API that supersedes flatMapGroupsWithState
    * (SPARK-46815). Differences from [[sessionizeStream]] are purely
    * mechanical: per-key state is a NAMED `ListState[Ev]` (RocksDB-backed
    * and incrementally appendable, where FMGWS rewrites one whole
    * `List[Ev]` blob per update), and closing a session without further
    * key traffic uses an explicit EVENT-TIME TIMER instead of the
    * GroupStateTimeout side channel. Emission semantics are identical
    * (a session closes once its end < watermark); SessionSpec pins both
    * implementations batch-equal and replays the cross-micro-batch
    * streaming scenario on this one too. Requires the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass`) in
    * streaming mode — the TWS operator's backing store.
    */
  def sessionizeTws(events: Dataset[SEv], gapMicros: Long,
                    forBatch: Boolean = false): Dataset[Sess] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
      StatefulProcessor, TimeMode, TimerValues, TTLConfig}
    val evEnc = implicitly[org.apache.spark.sql.Encoder[Ev]]
    val longEnc = implicitly[org.apache.spark.sql.Encoder[Long]]
    val proc = new StatefulProcessor[Long, SEv, Sess] {
      @transient private var buf: ListState[Ev] = _
      // the currently-armed expiry (ms): timers are immutable once
      // registered, so a later batch that moves the open-session end must
      // DELETE the superseded timer before arming the new one — without
      // this, stale timers accumulate per long-lived key and each expiry
      // re-invokes closeReady as a no-op
      @transient private var armed: org.apache.spark.sql.streaming
        .ValueState[Long] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        buf = getHandle.getListState[Ev]("events", evEnc, TTLConfig.NONE)
        armed = getHandle.getValueState[Long]("armed", longEnc, TTLConfig.NONE)
      }

      /** Arm `atMs`, deleting the previously-armed timer if it moved
        * (deleteTimer on an already-fired timestamp is a no-op). */
      private def rearm(atMs: Long): Unit = {
        if (armed.exists() && armed.get() != atMs)
          getHandle.deleteTimer(armed.get())
        getHandle.registerTimer(atMs)
        armed.update(atMs)
      }

      private def disarm(): Unit = {
        if (armed.exists()) {
          getHandle.deleteTimer(armed.get())
          armed.clear()
        }
      }

      /** Close everything the watermark has passed; re-buffer the rest and
        * arm a timer at the earliest still-open session end. In batch
        * (TimeMode.None — EventTime is streaming-only) each key is seen
        * exactly once with everything, so the watermark is effectively
        * infinite and no timer exists to arm. */
      private def closeReady(incoming: List[Ev],
                             wmMicros: Long): Iterator[Sess] = {
        val buffered =
          (if (buf.exists()) buf.get().toList else Nil) ++ incoming
        if (buffered.isEmpty) {
          buf.clear(); if (!forBatch) disarm(); Iterator.empty
        }
        else {
          val sessions =
            gapSplit(buffered.sortBy(e => (e.tsMicros, e.value)), gapMicros)
          val (closed, open) = sessions.partition(_.endMicros < wmMicros)
          if (open.isEmpty) { buf.clear(); if (!forBatch) disarm() }
          else {
            val openStart = open.map(_.startMicros).min
            buf.put(buffered.filter(_.tsMicros >= openStart).toArray)
            if (!forBatch)
              rearm(open.map(_.endMicros).min / 1000L + 1L)
          }
          closed.iterator
        }
      }

      override def handleInputRows(key: Long, rows: Iterator[SEv],
                                   tv: TimerValues): Iterator[Sess] =
        closeReady(
          rows.map(e => Ev(key, micros(e.ts), e.value)).toList,
          if (forBatch) Long.MaxValue
          else tv.getCurrentWatermarkInMs() * 1000L)

      override def handleExpiredTimer(key: Long, tv: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[Sess] =
        closeReady(Nil, tv.getCurrentWatermarkInMs() * 1000L)
    }
    events.groupByKey(_.userId)
      .transformWithState(proc,
        if (forBatch) TimeMode.None() else TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Adapter: events DataFrame → typed stream for the stateful variant. */
  def toTyped(events: DataFrame, key: String, ts: String)
             (implicit spark: SparkSession): Dataset[Ev] = {
    import spark.implicits._
    events.select(
      col(key).cast("long"),
      unix_micros(col(ts).cast("timestamp")),
      col("value")).as[(Long, Long, Double)]
      .map { case (k, t, v) => Ev(k, t, v) }
  }

  /** Per-entity ordered event sequences — the "last k actions per user"
    * feature a sequence model (next-event prediction, churn transformers)
    * trains on, exported as one comma-joined string plus its length.
    * Selection is the NEWEST `k` events by (ts, tiebreak) descending; the
    * emitted sequence reads oldest→newest (training order). Rows with a
    * NULL event label are excluded up front so the string and `seq_len`
    * agree.
    *
    * Scale shape: [[Sampling.quotaCap]]'s per-key window bounds the sort
    * at one user's history (never a corpus sort), and `k` caps what
    * `collect_list` holds per group — state is k·width per entity, the
    * contract that keeps the aggregation memory-safe however hot a user
    * is. The struct sort key (ts, tiebreak) makes the order total, so the
    * string is deterministic and oracle-checkable.
    */
  def eventSequences(events: DataFrame, key: String, ts: String,
                     tiebreak: String, typeCol: String, k: Int): DataFrame = {
    val lastK = Sampling.quotaCap(
      events.filter(col(typeCol).isNotNull)
        .select(col(key), col(ts), col(tiebreak), col(typeCol)),
      key, Seq(col(ts).desc, col(tiebreak).desc), k)
    lastK.groupBy(col(key))
      .agg(count(lit(1)).as("seq_len"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col(ts).as("t"),
            col(tiebreak).as("tb"), col(typeCol).as("e")))),
          x => x.getField("e"))).as("sequence"))
      .orderBy(col(key))
  }
}
