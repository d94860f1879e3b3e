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

  test("transformWithState KMV: final per-key update equals batch COUNT(DISTINCT)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // the state API v2 requires the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event].collect().sortBy(_.event_id)
      val input = MemoryStream[Streams.Event]
      val q = Streams.distinctByKey(input.toDS())
        .writeStream.outputMode("update").format("memory").queryName("kmv_out").start()
      try {
        val (first, second) = events.splitAt(events.length / 2)
        input.addData(first.toSeq); q.processAllAvailable()
        input.addData(second.toSeq); q.processAllAvailable()
      } finally q.stop()
      // the LAST update per key is the final running estimate; k=1024 >>
      // distinct users, so it must be exact
      val got = spark.table("kmv_out")
        .groupBy("key").agg(max(col("n_distinct")).as("n"))
        .as[(String, Long)].collect().toMap
      val want = Tables.events(spark, sfDir)
        .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
        .as[(String, Long)].collect().toMap
      assert(got == want)
      assert(want.nonEmpty)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session windows over a memory stream equal the batch session_window run") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .filter(col("user_id") < 10)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))

    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionWindowCounts(input.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("sw_out").start()
    try {
      // two batches so mid-stream sessions must merge across micro-batches
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sw_out")
      .orderBy("user_id", "session_start_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = Streams.sessionWindowCounts(
        Tables.events(spark, sfDir).filter(col("user_id") < 10))
      .orderBy("user_id", "session_start_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
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

  test("watermark drops late events: a row older than the watermark never updates its window") {
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Streams.windowedCounts(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("update").format("memory").queryName("late_out").start()
    try {
      // batch 1: one event in the 01:00 window, one far ahead at 05:10 —
      // after this batch the watermark advances to 03:10 (max ts - 2h)
      input.addData((ts("01:10"), "click", 1.0), (ts("05:10"), "click", 1.0))
      q.processAllAvailable()
      // batch 2: a late arrival in the already-closed 01:00 window
      input.addData((ts("01:20"), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val w0100 = spark.table("late_out")
      .filter(col("window_start") === ts("01:00"))
      .select("n").as[Long].collect().toSeq
    // the 01:00 window was updated exactly once, with n=1; the late event
    // produced no second update (it would appear as n=2)
    assert(w0100 == Seq(1L), s"late event leaked into closed window: $w0100")
  }

  test("streaming dedup keeps first per key across micro-batches, state watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = Streams.dedupWithinWatermark(
      input.toDF().toDF("ts", "event_id", "event_type"), Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      input.addData((ts("01:00"), 1L, "click"), (ts("01:01"), 2L, "view"))
      q.processAllAvailable()
      // batch 2: a replay of id 1 (duplicate) + a new id
      input.addData((ts("01:02"), 1L, "click"), (ts("01:03"), 3L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
    // batch path: same transformation, plain dropDuplicates
    val batchIds = Streams.dedupWithinWatermark(
      Seq((ts("01:00"), 1L, "a"), (ts("01:05"), 1L, "a"), (ts("01:06"), 2L, "b"))
        .toDF("ts", "event_id", "event_type"), Seq("event_id"))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(batchIds == Seq(1L, 2L))
  }

  test("watermark EVICTS dedup state: beyond-horizon redelivery re-admits, within-horizon drops") {
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = Streams.dedupWithinWatermark(
      input.toDF().toDF("ts", "event_id", "event_type"), Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("wm_evict").start()
    try {
      // b1: keys 1 (expiry 03:00) and 2 (expiry 04:30)
      input.addData((ts("01:00"), 1L, "a"), (ts("02:30"), 2L, "a"))
      q.processAllAvailable()
      // b2: advance event time; watermark after this batch = 03:30
      input.addData((ts("05:30"), 3L, "a"))
      q.processAllAvailable()
      // b3: runs AT watermark 03:30 — its end-of-batch cleanup evicts
      // key 1 (expiry 03:00 < 03:30) and keeps key 2 (04:30); eviction
      // happens at batch END, which is why the redelivery below needs
      // its own later batch (the file-replay query pins the same)
      input.addData((ts("06:00"), 4L, "a"))
      q.processAllAvailable()
      // b4: key 1 redelivered beyond its horizon -> re-admitted;
      // key 2 redelivered with state alive -> dropped
      input.addData((ts("05:00"), 1L, "a"), (ts("05:00"), 2L, "a"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("wm_evict").select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 1L, 2L, 3L, 4L),
      s"expected key 1 re-admitted after eviction, key 2 still deduped: $ids")
  }

  test("stream-stream interval join matches purchases to in-window signups only") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-0$s:00")
    val sIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val pIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    def named(df: org.apache.spark.sql.DataFrame) = df.toDF("ts", "user_id", "event_id")
    val q = Streams.signupPurchaseJoin(
      named(sIn.toDF()), named(pIn.toDF()), withinHours = 24)
      .writeStream.outputMode("append").format("memory").queryName("ss_join").start()
    try {
      sIn.addData(
        (ts("1 10:00"), 1L, 100L), // in window for u1's purchase
        (ts("1 09:00"), 2L, 200L)) // 49h before u2's purchase: out of window
      pIn.addData(
        (ts("2 09:00"), 1L, 900L), // 23h after signup: joins
        (ts("3 10:00"), 2L, 901L)) // no in-window signup
      q.processAllAvailable()
      // advance both watermarks far past the data so results flush
      sIn.addData((ts("9 00:00"), 9L, 999L))
      pIn.addData((ts("9 00:00"), 9L, 998L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ss_join")
      .select("user_id", "purchase_id", "signup_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 900L, 100L)), s"in-window pair must join: $got")
    assert(!got.exists(_._1 == 2L), s"out-of-window signup must not join: $got")
    // batch path: same semantics on static frames
    val batch = Streams.signupPurchaseJoin(
      Seq((ts("1 10:00"), 1L, 100L)).toDF("ts", "user_id", "event_id"),
      Seq((ts("2 09:00"), 1L, 900L)).toDF("ts", "user_id", "event_id"))
    assert(batch.select("lag_us").as[Long].head() == 23L * 3600 * 1000000)
  }

  test("stream-static join enriches each micro-batch with the dimension frame") {
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = Streams.enrichWithDim(
      input.toDF().toDF("ts", "user_id", "event_type"), dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try {
      input.addData((ts("01:00"), 1L, "click"), (ts("01:01"), 3L, "view"))
      q.processAllAvailable()
      input.addData((ts("01:02"), 2L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enrich_out")
      .select("user_id", "tier").as[(Long, Option[String])].collect().toSet
    // known users stamped; unknown user survives the left join with null
    assert(got == Set((1L, Some("gold")), (3L, None), (2L, Some("basic"))))
    // the stream-static join is STATELESS: the static side re-resolves
    // per micro-batch, no state store rows ever accumulate (contrast the
    // stream-stream interval join) — the property that makes enrichment
    // cost O(batch) forever
    assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
      s"stream-static join must keep no state: ${q.lastProgress}")
  }

  test("foreachBatch re-resolves a Versioned dim per batch: mid-stream merge is visible") {
    implicit val sqlCtx = spark.sqlContext
    val dimTable = tmpDir("sdim").toString
    graft.store.Versioned.append(
      Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier"), dimTable)
    val input = MemoryStream[Long]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = input.toDF().toDF("user_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val dim = graft.store.Versioned.read(spark, dimTable)
        got ++= batch.join(dim, "user_id")
          .select(col("user_id"), col("tier"))
          .collect().map(r => (id, r.getLong(0), r.getString(1)))
        if (id == 0) graft.store.Versioned.merge(spark, dimTable,
          Seq((1L, "moved")).toDF("user_id", "tier"), keys = Seq("user_id")): Unit
      }
      .option("checkpointLocation", tmpDir("sdim-ckpt").toString)
      .start()
    try {
      input.addData(1L, 2L); q.processAllAvailable()
      input.addData(1L); q.processAllAvailable()
    } finally q.stop()
    // batch 0 sees the original tier; batch 1 sees the merged one
    assert(got.toSet == Set((0L, 1L, "gold"), (0L, 2L, "basic"), (1L, 1L, "moved")))
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

  test("event-time timers: input re-arms before expiry, boundary fire, re-alert after return") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1704067200000000L // 2024-01-01T00:00:00Z micros
      def ts(us: Long) = new java.sql.Timestamp(us / 1000)
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val alerts = Streams.inactivityAlerts(
        input.toDF().toDF("user_id", "ts"), gapMs = 60000L, watermark = "0 seconds")
      val q = alerts.writeStream.outputMode("append")
        .format("memory").queryName("inact_out").start()
      def sec(s: Long) = ts(t0 + s * 1000000L)
      try {
        // batch 1: u1 and u2 arm timers at t0+60s
        input.addData((1L, sec(0)), (2L, sec(0))); q.processAllAvailable()
        // batch 2: u1 re-arms (input processes BEFORE expiry eval — no
        // spurious u1 alert); u3's row puts the watermark EXACTLY on
        // u2's deadline — boundary probe
        input.addData((1L, sec(70)), (3L, sec(60))); q.processAllAvailable()
        // batch 3: watermark far past every armed deadline
        input.addData((99L, sec(300))); q.processAllAvailable()
        // batch 4: u1 returns after alerting — re-arms and alerts AGAIN
        input.addData((1L, sec(310))); q.processAllAvailable()
        input.addData((98L, sec(1000))); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("inact_out")
        .as[Streams.InactivityAlert].collect()
        .map(a => (a.user_id, (a.last_seen_us - t0) / 1000000L, a.n_events)).toSet
      // u2 fires at the boundary batch (wm == deadline ⇒ fires) with its
      // state at expiry; u1 fires in batch 3 (deadline t0+130 < wm 300),
      // returns in batch 4, fires AGAIN in batch 5; u3 (deadline 120)
      // and u99 (deadline 360) fire once each along the way; u98 never
      // (no watermark ever passes t0+1060)
      assert(got == Set(
        (2L, 0L, 1L), // boundary fire, batch 2
        (1L, 70L, 2L), (1L, 310L, 3L), // alert, return, re-alert
        (3L, 60L, 1L),
        (99L, 300L, 1L)), got.toString)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("upsert read-compare is O(batch): resident scan semi-joins on batch keys below the aggregate") {
    // the resident-table read must prune to the micro-batch's keys
    // BEFORE its per-key max aggregate — aggregating the whole table per
    // batch is O(table · batches), the round-9 X132 weak mark
    val cur = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 5L, "c")).toDF("k", "ord", "v")
    val latest = Seq((1L, 15L, "new"), (3L, 1L, "stale"), (4L, 7L, "ins"))
      .toDF("k", "ord", "v")
    val out = Streams.resolveAgainstResident(cur, latest, Seq("k"), Seq("ord", "v"))
    // semantics: strictly-newer wins, stale drops, unseen key inserts
    assert(out.select("k", "ord").as[(Long, Long)].collect().toSet ==
      Set((1L, 15L), (4L, 7L)))
    val p = out.queryExecution.optimizedPlan.toString
    val aggIdx = p.indexOf("Aggregate")
    val semiIdx = p.indexOf("LeftSemi")
    assert(aggIdx >= 0 && semiIdx >= 0 && aggIdx < semiIdx,
      s"the LeftSemi key prune must sit BELOW the resident aggregate:\n$p")
  }
}
