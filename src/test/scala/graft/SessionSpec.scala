package graft

import org.apache.spark.sql.functions._
import graft.ops.Session

/** Sessionization: built-in session_window vs the flatMapGroupsWithState
  * implementation, plus gap boundary semantics.
  */
class SessionSpec extends SparkSpec {
  import spark.implicits._

  test("built-in and custom-state sessionization agree on the corpus") {
    val events = Tables.events(spark, sfDir)
    val builtin = Session.sessionWindows(events, "user_id", "ts", "30 minutes")
      .select($"user_id",
        unix_micros($"session_start".cast("timestamp")).as("s"),
        unix_micros($"session_end".cast("timestamp")).as("e"),
        $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    implicit val s = spark
    val stateful = Session.sessionizeWithState(
        Session.toTyped(events, "user_id", "ts"), 30L * 60 * 1000000)
      .map(x => (x.userId, x.startMicros, x.endMicros, x.nEvents))
      .collect().toSet
    assert(builtin == stateful)
    assert(builtin.nonEmpty)
  }

  test("gap boundary: exactly-gap merges, beyond-gap splits") {
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val atGap = Seq((1L, ts(0), 1.0), (1L, ts(30), 1.0))
      .toDF("user_id", "ts", "value")
    assert(Session.sessionWindows(atGap, "user_id", "ts", "30 minutes")
      .count() == 1) // inclusive: event at last+gap still merges
    val beyond = Seq((1L, ts(0), 1.0), (1L, ts(31), 1.0))
      .toDF("user_id", "ts", "value")
    assert(Session.sessionWindows(beyond, "user_id", "ts", "30 minutes")
      .count() == 2)
  }

  test("streaming sessionization carries open sessions across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val stream = MemoryStream[Session.SEv]
    val sessions = Session.sessionizeStream(
      stream.toDS().withWatermark("ts", "0 seconds"), 30L * 60 * 1000000)
    val q = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // batch 1: two events of one session
      stream.addData(Session.SEv(1L, ts(0), 1.0), Session.SEv(1L, ts(10), 1.0))
      q.processAllAvailable()
      // batch 2: extends the SAME session (within gap of ts=10)
      stream.addData(Session.SEv(1L, ts(20), 1.0))
      q.processAllAvailable()
      // push the watermark far past the session end, then let the
      // event-time timeout fire in a follow-up batch
      stream.addData(Session.SEv(99L, ts(100000), 0.0))
      q.processAllAvailable()
      stream.addData(Session.SEv(99L, ts(200000), 0.0))
      q.processAllAvailable()

      val out = spark.table("sess_stream")
        .filter($"userId" === 1L)
        .select("startMicros", "endMicros", "nEvents")
        .as[(Long, Long, Long)].collect().toList
      // ONE session [t0, t20+gap) with all 3 events — not two overlapping
      // fragments (the bug this spec guards against)
      assert(out == List((ts(0).getTime * 1000L,
        ts(20).getTime * 1000L + 30L * 60 * 1000000, 3L)), s"got $out")
    } finally q.stop()
  }

  test("transformWithState sessionizer: batch-equal to the built-in, and " +
      "carries open sessions across micro-batches with event-time timers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // streaming FIRST: beyond being the scenario under test, starting a
    // streaming query spins up the StateStoreCoordinator that batch-mode
    // TWS also needs (batch alone hits RpcEndpointNotFoundException —
    // the coordinator is created by the streaming engine)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    val stream = MemoryStream[Session.SEv]
    val sessions = Session.sessionizeTws(
      stream.toDS().withWatermark("ts", "0 seconds"), 30L * 60 * 1000000)
    val q = sessions.writeStream.format("memory").queryName("sess_tws")
      .outputMode("append").start()
    try {
      stream.addData(Session.SEv(1L, ts(0), 1.0), Session.SEv(1L, ts(10), 1.0))
      q.processAllAvailable()
      stream.addData(Session.SEv(1L, ts(20), 1.0)) // extends the session
      q.processAllAvailable()
      // advance the watermark with other-key traffic; the TIMER (not key
      // traffic) must close user 1's session
      stream.addData(Session.SEv(99L, ts(100000), 0.0))
      q.processAllAvailable()
      stream.addData(Session.SEv(99L, ts(200000), 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_tws")
        .filter($"userId" === 1L)
        .select("startMicros", "endMicros", "nEvents")
        .as[(Long, Long, Long)].collect().toList
      assert(out == List((ts(0).getTime * 1000L,
        ts(20).getTime * 1000L + 30L * 60 * 1000000, 3L)), s"got $out")
      // batch mode: TWS over the corpus must equal the built-in
      val events = Tables.events(spark, sfDir)
      val builtin = Session.sessionWindows(events, "user_id", "ts",
          "30 minutes")
        .select($"user_id",
          unix_micros($"session_start".cast("timestamp")).as("s"),
          unix_micros($"session_end".cast("timestamp")).as("e"),
          $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      val typedEv = events.select(col("user_id").cast("long").as("userId"),
          col("ts").cast("timestamp").as("ts"), col("value"))
        .as[Session.SEv]
      val tws = Session.sessionizeTws(typedEv, 30L * 60 * 1000000,
          forBatch = true)
        .map(x => (x.userId, x.startMicros, x.endMicros, x.nEvents))
        .collect().toSet
      assert(tws == builtin)
      assert(tws.nonEmpty)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("built-in session_window works in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val stream = MemoryStream[Session.SEv]
    val agg = Session.sessionWindows(
      stream.toDS().withWatermark("ts", "0 seconds")
        .toDF("user_id", "ts", "value"),
      "user_id", "ts", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("sw_stream")
      .outputMode("append").start()
    try {
      stream.addData(Session.SEv(1L, ts(0), 1.0), Session.SEv(1L, ts(10), 2.0))
      q.processAllAvailable()
      stream.addData(Session.SEv(1L, ts(20), 3.0))  // merges via state store
      q.processAllAvailable()
      stream.addData(Session.SEv(99L, ts(100000), 0.0)) // advance watermark
      q.processAllAvailable()
      stream.addData(Session.SEv(99L, ts(200000), 0.0)) // flush closed
      q.processAllAvailable()
      val out = spark.table("sw_stream").filter($"user_id" === 1L)
        .select("n_events", "session_value").as[(Long, Double)].collect().toList
      assert(out == List((3L, 6.0)), s"got $out") // one merged session
    } finally q.stop()
  }

  test("events within the gap merge into one session") {
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val df = Seq((1L, ts(0), 1.0), (1L, ts(29), 1.0), (1L, ts(58), 1.0))
      .toDF("user_id", "ts", "value")
    val out = Session.sessionWindows(df, "user_id", "ts", "30 minutes")
      .select("n_events").as[Long].collect().toList
    assert(out == List(3)) // each arrives within 30min of the last
  }

  test("eventSequences: newest-k selection, oldest-first order, ts tiebreak " +
      "by id, null labels excluded") {
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      (1L, ts(0), 10L, Some("a")), (1L, ts(1), 11L, Some("b")),
      (1L, ts(2), 12L, Some("c")), (1L, ts(3), 13L, Some("d")),
      (2L, ts(5), 20L, Some("x")), (2L, ts(5), 21L, Some("y")), // ts tie
      (3L, ts(7), 30L, None) // label-less user vanishes entirely
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Session.eventSequences(df, "user_id", "ts", "event_id",
        "event_type", k = 3)
      .as[(Long, Long, String)].collect().toList
    // user 1: newest 3 of 4 (b,c,d), emitted oldest->newest
    // user 2: equal ts ordered by event_id
    assert(out == List((1L, 3L, "b,c,d"), (2L, 2L, "x,y")))
  }
}
