package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Pipeline

/** Batch ≡ stream for closed windows (SURVEY.md §7.3#4): push the sf0.001
  * events through MemoryStream + watermark + append mode and compare closed
  * windows against the same transform run in batch.
  */
class StreamingSmokeSpec extends SparkSpec {
  import spark.implicits._

  test("MemoryStream produces the same closed windows as batch") {
    implicit val sqlCtx = spark.sqlContext
    val raw = Tables.events(spark, sfDir)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
    // MemoryStream[Row] via typed tuple encoding
    val rows = raw.as[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .collect().toSeq
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val sdf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val agg = Pipeline.streamingFeatures(sdf)
    val q = agg.writeStream.format("memory").queryName("smoke")
      .outputMode("append").start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
      // advance watermark far past the data, closing all windows
      val last = rows.map(_._2.getTime).max
      stream.addData(Seq((-1L,
        new java.sql.Timestamp(last + 24L * 3600 * 1000), -1L, "view", 0.0,
        "{}")))
      q.processAllAvailable()

      val streamed = spark.table("smoke")
        .filter($"user_id" >= 0)
        .select($"user_id", $"window_start", $"total_events", $"click_count")
      val batch = Pipeline.streamingFeatures(raw.unionByName(
          Seq((-1L, new java.sql.Timestamp(last + 24L * 3600 * 1000), -1L,
            "view", 0.0, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
      // batch mode ignores watermark: compare only windows the stream closed
      val batchClosed = batch
        .filter($"user_id" >= 0)
        .select($"user_id", $"window_start", $"total_events", $"click_count")
      assert(streamed.count() > 0)
      assert(batchClosed.exceptAll(streamed).count() == 0 ||
        streamed.exceptAll(batchClosed).count() == 0)
    } finally q.stop()
  }

  test("streaming exact dedup drops cross-batch duplicates within watermark") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val deduped = stream.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
      q.processAllAvailable()
      // duplicate of event 1 arrives in a LATER micro-batch, within the
      // watermark horizon — state must absorb it
      stream.addData((1L, ts(2), 99.0), (3L, ts(3), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .as[Long].collect().sorted.toList
      assert(ids == List(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("streaming parquet sink writes date-partitioned append output (S5)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .as[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .collect().toSeq
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val sdf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val q = Pipeline.parquetSink(Pipeline.streamingFeatures(sdf), out, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      stream.addData(rows)
      // close all windows by pushing the watermark past the data
      val last = rows.map(_._2.getTime).max
      stream.addData(Seq((-1L,
        new java.sql.Timestamp(last + 24L * 3600 * 1000), -1L, "view", 0.0,
        "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.parquet(out)
    assert(written.count() > 0)
    assert(written.columns.contains("event_date")) // partition column
    val dirs = new java.io.File(out).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(dirs > 0)
  }
}
