package graft.streaming

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.store.ChunkStore

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def uploadBatch(dir: String, rows: (String, String, String)*): Unit =
    rows.toSeq
      .map { case (p, u, t) => (p, u, t.getBytes(StandardCharsets.UTF_8)) }
      .toDF("path", "user", "content")
      .write.mode("append").parquet(dir)

  test("micro-batched uploads flow through ingest into the store; replays dedup") {
    val landing = tmpDir("ingest-landing").toString
    val store = tmpDir("ingest-store").toString + "/chunks"
    val ck = tmpDir("ingest-ck").toString

    // batch 1: two docs from two tenants
    uploadBatch(landing,
      ("/up/a.txt", "a@x.com", (1 to 300).map(i => s"alpha$i").mkString(" ")),
      ("/up/b.txt", "b@y.com", "a short tenant-b document"))
    val q1 = StreamingIngest.start(spark, landing, store, ck)
    q1.awaitTermination() // AvailableNow: drains and stops
    val afterFirst = ChunkStore.count(spark, store)
    assert(afterFirst > 1)

    // batch 2: one new doc + one byte-identical re-upload under a new name
    uploadBatch(landing,
      ("/up/c.txt", "a@x.com", "a brand new document"),
      ("/up/a_copy.txt", "a@x.com", (1 to 300).map(i => s"alpha$i").mkString(" ")))
    val q2 = StreamingIngest.start(spark, landing, store, ck)
    q2.awaitTermination()

    val loaded = ChunkStore.load(spark, store)
    val sources = loaded.select("source").distinct().as[String].collect().toSet
    // the duplicate re-upload must NOT have landed
    assert(sources == Set("a.txt", "b.txt", "c.txt"))
    assert(ChunkStore.count(spark, store) == afterFirst + 1) // c.txt is 1 chunk
    // tenancy survives the streaming path
    assert(ChunkStore.userScoped(loaded, "b@y.com").count() == 1)
  }

  test("a partially-appended file is healed on replay, not dropped as a duplicate") {
    import graft.ingest.IngestPipeline
    val landing = tmpDir("heal-landing").toString
    val store = tmpDir("heal-store").toString + "/chunks"
    val ck = tmpDir("heal-ck").toString
    val text = (1 to 600).map(i => s"word$i").mkString(" ") // several chunks

    // simulate a crash mid-append: only chunk_seq=0 of the file made it in
    val files = Seq(("/up/big.txt", "a@x.com", text.getBytes(StandardCharsets.UTF_8)))
      .toDF("path", "user", "content")
    val full = IngestPipeline.ingest(spark, files, None, cacheParsed = false).chunks
    val total = full.count()
    assert(total > 1)
    ChunkStore.append(full.filter($"chunk_seq" === 0), store)
    assert(ChunkStore.count(spark, store) == 1)

    // the stream now delivers the same upload (replay after the crash)
    uploadBatch(landing, ("/up/big.txt", "a@x.com", text))
    StreamingIngest.start(spark, landing, store, ck).awaitTermination()

    // every missing chunk was appended exactly once
    val loaded = ChunkStore.load(spark, store)
    assert(loaded.count() == total)
    assert(loaded.select("chunk_id").distinct().count() == total)
  }
}
