package graft.ingest

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def files(rows: (String, String, String)*): DataFrame =
    rows.toSeq
      .map { case (path, user, text) => (path, user, text.getBytes(StandardCharsets.UTF_8)) }
      .toDF("path", "user", "content")

  private def statusOf(batch: IngestBatch): Map[String, String] =
    batch.outcomes.select("path", "status").as[(String, String)].collect().toMap

  test("happy path: txt file chunks with full metadata and embeddings") {
    val text = (1 to 300).map(i => s"word$i").mkString(" ")
    val batch = IngestPipeline.ingest(spark, files(("/up/Notes.TXT", "a@x.com", text)), None)
    assert(statusOf(batch) == Map("/up/Notes.TXT" -> "ok"))
    val chunks = batch.chunks.collect()
    assert(chunks.length > 1) // 1000/200 splitter over ~2.3k chars
    val row = batch.chunks.as[ChunkRow].head()
    assert(row.source == "notes.txt") // lowercased filename
    assert(row.`type` == "txt")
    assert(row.file_hash.matches("[0-9a-f]{64}"))
    assert(row.embedding.length == 64)
    assert(batch.chunks.select("chunk_id").distinct().count() == chunks.length)
  }

  test("a real .docx flows end-to-end through the default parsers") {
    // minimal but structurally faithful OOXML archive
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      "<w:body><w:p><w:r><w:t>quarterly revenue review</w:t></w:r></w:p></w:body></w:document>")
      .getBytes(StandardCharsets.UTF_8))
    z.closeEntry(); z.close()
    val batch = IngestPipeline.ingest(spark,
      Seq(("/up/Report.DOCX", "a@x.com", bos.toByteArray)).toDF("path", "user", "content"), None)
    assert(statusOf(batch) == Map("/up/Report.DOCX" -> "ok"))
    val row = batch.chunks.as[ChunkRow].head()
    assert(row.`type` == "docx" && row.source == "report.docx")
    assert(row.text == "quarterly revenue review")
  }

  test("unsupported extension is rejected") {
    val batch = IngestPipeline.ingest(spark, files(("/up/archive.zip", "a@x.com", "data")), None)
    assert(statusOf(batch)("/up/archive.zip") == "unsupported_type")
    assert(batch.chunks.isEmpty)
  }

  test("whitespace-only file reports no_content") {
    val batch = IngestPipeline.ingest(spark, files(("/up/blank.txt", "a@x.com", "   \n\n  ")), None)
    assert(statusOf(batch)("/up/blank.txt") == "no_content")
  }

  test("binary formats without a decoder report parse_error; injected decoder works") {
    val f = files(("/up/slides.pdf", "a@x.com", "raw-bytes"))
    val without = IngestPipeline.ingest(spark, f, None)
    assert(statusOf(without)("/up/slides.pdf") == "parse_error")

    val fake: IngestPipeline.Parser = b => Right(Seq(new String(b, StandardCharsets.UTF_8)))
    val parsers = IngestPipeline.defaultParsers + ("pdf" -> fake)
    val withFake = IngestPipeline.ingest(spark, f, None, parsers = parsers)
    assert(statusOf(withFake)("/up/slides.pdf") == "ok")
  }

  test("byte-identical re-upload under a different name is rejected as duplicate") {
    val text = "identical content for duplicate detection"
    val first = IngestPipeline.ingest(spark, files(("/up/a.txt", "a@x.com", text)), None)
    assert(statusOf(first)("/up/a.txt") == "ok")
    val second = IngestPipeline.ingest(
      spark, files(("/up/b.txt", "a@x.com", text)), Some(first.chunks))
    assert(statusOf(second)("/up/b.txt") == "duplicate")
    assert(second.chunks.isEmpty)
  }

  test("dedup is tenant-scoped: another tenant's identical bytes are accepted") {
    val text = "shared content across tenants"
    val first = IngestPipeline.ingest(spark, files(("/up/a.txt", "a@x.com", text)), None)
    val second = IngestPipeline.ingest(
      spark, files(("/up/b.txt", "b@y.com", text)), Some(first.chunks))
    // tenant B never stored these bytes — rejecting would lose B's data
    // under user-scoped retrieval
    assert(statusOf(second)("/up/b.txt") == "ok")
  }

  test("intra-batch duplicates: first path wins, the rest are rejected") {
    val text = "same bytes twice in one batch"
    val batch = IngestPipeline.ingest(spark, files(
      ("/up/a.txt", "a@x.com", text),
      ("/up/z_copy.txt", "a@x.com", text),
      ("/up/other-tenant.txt", "b@y.com", text)), None)
    val s = statusOf(batch)
    assert(s("/up/a.txt") == "ok")
    assert(s("/up/z_copy.txt") == "duplicate")
    assert(s("/up/other-tenant.txt") == "ok") // different tenant, not a dup
    // no colliding chunk_ids reach the store
    assert(batch.chunks.select("chunk_id").distinct().count() == batch.chunks.count())
  }

  test("csv loads one document per row with header: value lines") {
    val csv = "name,city\nada,london\nalan,cambridge"
    val batch = IngestPipeline.ingest(spark, files(("/up/people.csv", "a@x.com", csv)), None)
    val texts = batch.chunks.select("text").as[String].collect().sorted
    assert(texts.toSeq == Seq("name: ada\ncity: london", "name: alan\ncity: cambridge").sorted)
  }

  test("html parsing strips tags and scripts") {
    val html = "<html><script>var x=1;</script><body><h1>Title</h1><p>Body text</p></body></html>"
    val batch = IngestPipeline.ingest(spark, files(("/up/page.html", "a@x.com", html)), None)
    val text = batch.chunks.select("text").as[String].head()
    assert(text == "Title Body text")
  }

  test("batch of mixed files classifies each row independently") {
    val batch = IngestPipeline.ingest(spark, files(
      ("/up/good.md", "a@x.com", "some markdown content"),
      ("/up/bad.exe", "a@x.com", "binary"),
      ("/up/empty.txt", "b@x.com", "")), None)
    val s = statusOf(batch)
    assert(s("/up/good.md") == "ok")
    assert(s("/up/bad.exe") == "unsupported_type")
    assert(s("/up/empty.txt") == "no_content")
  }
}
