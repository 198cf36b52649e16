package graft

import graft.streaming.Pipeline
import org.apache.spark.sql.streaming.Trigger

/** The streaming wrapper driven end-to-end through a REAL unbounded
  * source (`rate-micro-batch` — SURVEY G7's broker-free stand-in for the
  * reference's rate-limited generator, `scripts/stream_generator.py:
  * 233-269`): trigger scheduling, watermark advancement and window
  * closing are exercised by the engine's own micro-batch loop, not by
  * MemoryStream's manual addData. Parity contract: every window the
  * stream CLOSES must equal the batch flagship over the same synthesized
  * value range — exact, not approximate, because event time and all
  * fields derive deterministically from the sequence value.
  */
class RateSourceSpec extends SparkSpec {
  import spark.implicits._

  test("rate-source run: closed windows equal the batch flagship over " +
      "the same synthesized rows") {
    val q = Pipeline.streamingFeatures(Pipeline.rateSource(spark, 600))
      .writeStream.format("memory").queryName("ratesmoke")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("300 milliseconds"))
      .start()
    try {
      // let several micro-batches through (each advances event time by
      // 10 h, far past the 15-min watermark, closing earlier windows).
      // NO processAllAvailable: an unbounded rate source always has a
      // next batch, so that call never returns — poll progress instead.
      val deadline = System.currentTimeMillis() + 90000
      while (q.recentProgress.length < 5 &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()
    // committed batches only; a possible final uncounted batch cannot
    // have contributed to any CLOSED window (event time is monotone in
    // the sequence value, and a window closes strictly below the
    // watermark, which lags all of that batch's timestamps)
    val total = q.recentProgress.map(_.numInputRows).sum
    assert(total >= 2 * 600, s"stream consumed only $total rows")
    val streamed = spark.table("ratesmoke")
      .select($"user_id", $"window_start", $"total_events", $"click_count",
        $"unique_k_approx", $"total_revenue")
    val streamedCount = streamed.count()
    assert(streamedCount > 0, "no windows closed")
    // the batch twin over exactly the consumed value range
    val batch = Pipeline.streamingFeatures(
        Pipeline.syntheticEvents(spark.range(0, total).toDF("value")))
      .select($"user_id", $"window_start", $"total_events", $"click_count",
        $"unique_k_approx", $"total_revenue")
    // every CLOSED window agrees exactly (the still-open tail only
    // exists on the batch side)
    assert(streamed.exceptAll(batch).count() == 0,
      "stream emitted a window the batch twin disagrees with")
  }
}
