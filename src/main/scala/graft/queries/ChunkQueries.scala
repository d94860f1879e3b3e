package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.Chunker

/** Chunk-split operators (reference T1 — RecursiveCharacterTextSplitter at
  * /root/reference/helper/multiple_document_upload.py:121-126). Two
  * declared forms:
  *
  *  - `chunk_fixed`: fixed-stride sliding window (size 40 / stride 30 ≙
  *    overlap 10) — fully SQL-expressible, so it carries a DuckDB oracle
  *    and pins the explode/substring machinery exactly.
  *  - `chunk_recursive`: the faithful recursive splitter (separator
  *    hierarchy + greedy merge) — not SQL-expressible; declared without an
  *    oracle (driver rows-only check) and pinned by ChunkerSpec instead.
  *
  * Both are generator-shaped (1 doc → N chunks) and run as
  * `explode(f(text))` — per-row expansion, no shuffle, scales linearly.
  */
object ChunkQueries {

  /** Fixture texts are 48-553 chars, so the declared queries use a small
    * window (40/10) to actually produce multi-chunk output; the reference's
    * 1000/200 config is exercised by ChunkerSpec. */
  val FixedSize = 40
  val FixedStride = 30

  def chunkFixed(spark: SparkSession, dir: String): DataFrame = {
    val nChunks = floor((length(col("text")) - 1) / lit(FixedStride)).cast("int")
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), nChunks),
          i => substring(col("text"), (i * FixedStride + 1).cast("int"), lit(FixedSize))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"), length(col("chunk")).as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def chunkRecursive(spark: SparkSession, dir: String): DataFrame = {
    val chunker = new Chunker(120, 30)
    val chunkUdf = udf((text: String) => chunker.split(text).filter(_.trim.nonEmpty))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(chunkUdf(col("text"))).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), length(col("chunk")).as("chunk_len"),
        substring(sha2(col("chunk"), 256), 1, 16).as("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_fixed" -> (chunkFixed _),
    "chunk_recursive" -> (chunkRecursive _)
  )

  val oracles: Map[String, String] = Map(
    // chunk_recursive intentionally absent: recursive splitter is not
    // SQL-expressible; ScalaTest pins its semantics.
    "chunk_fixed" ->
      s"""WITH c AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(0, (length(text) - 1) // $FixedStride),
         |    i -> struct_pack(chunk_idx := i, chunk := substring(text, i * $FixedStride + 1, $FixedSize)))) AS s
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id, CAST(s.chunk_idx AS INT) AS chunk_idx, s.chunk,
         |  CAST(length(s.chunk) AS INT) AS chunk_len
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
