package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import graft.ingest.IngestPipeline

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("directory landing zone feeds the ingest pipeline end-to-end") {
    val dir = tmpDir("landing")
    Files.write(dir.resolve("Doc1.TXT"), "first uploaded document".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("notes.md"), "some markdown notes".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("bad.exe"), "nope".getBytes(StandardCharsets.UTF_8))
    val files = Sources.uploadsFromDirectory(spark, dir.toString, "a@x.com")
    val batch = IngestPipeline.ingest(spark, files, None)
    val statuses = batch.outcomes.select("source", "status").as[(String, String)].collect().toMap
    assert(statuses == Map(
      "doc1.txt" -> "ok", "notes.md" -> "ok", "bad.exe" -> "unsupported_type"))
    assert(batch.chunks.count() == 2)
  }

  test("jsonl shards load one document per line with stable per-shard indexes") {
    val dir = tmpDir("jsonl")
    Files.write(dir.resolve("shard0.jsonl"),
      """{"text": "doc one", "meta": 1}
        |{"text": "doc two", "meta": 2}
        |{"text": "doc three", "meta": 3}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val docs = Sources.jsonlDocuments(spark, dir.toString + "/*.jsonl")
    val got = docs.select("doc_idx", "text").as[(Int, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(1 -> "doc one", 2 -> "doc two", 3 -> "doc three"))
  }

  test("orc round-trip preserves rows and pushes filters into the scan") {
    val dir = tmpDir("orc").toString + "/docs"
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    Sources.writeOrc(docs, dir, partitionCols = Seq("lang"))
    val back = Sources.orcDocuments(spark, dir)
    assert(back.count() == docs.count())
    // partition pruning on the partition column, pushdown on data columns
    val filtered = back.filter($"lang" === "en" && $"doc_id" < 100)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,100)"), plan)
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    assert(filtered.count() ==
      docs.filter($"lang" === "en" && $"doc_id" < 100).count())
  }

  test("csv corpus reads with header projection") {
    val dir = tmpDir("csv")
    Files.write(dir.resolve("corpus.csv"),
      "id,body,junk\n1,hello world,x\n2,second row,y\n".getBytes(StandardCharsets.UTF_8))
    val docs = Sources.csvDocuments(spark, dir.toString + "/*.csv", "body")
    assert(docs.select("text").as[String].collect().sorted.toSeq ==
      Seq("hello world", "second row"))
  }
}
