package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal the batch aggregation (parquet source, availableNow)") {
    // stage a copy of the events fixture as a streaming source directory
    val srcDir = tmpDir("stream-src").toString
    val batch = Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "event_type", "value")
    batch.write.mode("overwrite").parquet(srcDir)
    val staged = spark.read.parquet(srcDir)

    val stream = Streams.eventStream(spark, srcDir, staged)
    val q = Streams.windowedCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_out")
      .select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    val want = Streams.windowedCounts(staged)
      .select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("stateful sessionization over a memory stream matches the batch count") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .filter(col("user_id") < 10)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionCounts(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("sess_out").start()
    try {
      // feed in two batches to exercise state carry-over
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()

    // last update per user is the final state
    val got = spark.table("sess_out")
      .groupBy("user_id").agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.n_sessions"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap

    val batchTruth = graft.queries.EventQueries.sessionize(spark, sfDir)
      .filter(col("user_id") < 10)
      .select("user_id", "n_events", "n_sessions")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap

    assert(got == batchTruth)
  }

  test("append sink writes streaming records to parquet") {
    val srcDir = tmpDir("chat-src").toString
    val outDir = tmpDir("chat-out").toString + "/data"
    val ckDir = tmpDir("chat-ck").toString
    val recs = Seq(
      Streams.ChatRecord(new java.sql.Timestamp(1700000000000L), "a@x.com", "q1", "a1"),
      Streams.ChatRecord(new java.sql.Timestamp(1700000001000L), "b@y.com", "q2", "a2"))
    recs.toDF().write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(recs.toDF().schema).parquet(srcDir)
    val q = Streams.appendSink(stream, outDir, ckDir, "chat_sink")
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(outDir).count() == 2)
  }
}
