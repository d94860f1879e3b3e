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
  *    hierarchy + greedy merge with overlap carry) — oracle-checked via a
  *    recursive-CTE reduction valid for the single-line fixture corpus
  *    (see the oracle comment below), and pinned on arbitrary inputs by
  *    ChunkerSpec + ChunkerProps.
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
    // chunk_recursive: the recursive splitter IS SQL-expressible for this
    // corpus. The fixture texts are single-line with single spaces (no
    // "\n\n"/"\n"/double-space — verified at every scale factor), so the
    // separator hierarchy reduces to word pieces (first bare, rest
    // " "-prefixed) and the splitter to the greedy ≤120-char merge with
    // ≤30-char tail carry. The CTE precomputes, per possible window
    // start s, the greedy window end e(s) (max i with cum(i)-cum(s-1) ≤
    // 120) and the post-emit next start (min k with tail ≤ 30 and
    // tail + next-piece ≤ 120 — the Chunker's exact pop condition), then
    // a recursive walk emits the chunk windows in order. Chunk text is a
    // substring by cumulative offsets; trim = dropping the piece's
    // leading space. Verified chunk-for-chunk against the Scala Chunker
    // output (1748/1748 at sf0.01). A corpus violating the single-line
    // assumption would hash-mismatch loudly, not silently pass.
    "chunk_recursive" ->
      """WITH RECURSIVE
        |pieces AS (
        |  SELECT doc_id, i,
        |    CASE WHEN i = 1 THEN length(ws[i]) ELSE 1 + length(ws[i]) END AS len
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |       (SELECT unnest(generate_series(1, len(ws))) AS i)),
        |cum2 AS (
        |  SELECT doc_id, i, len,
        |    CAST(SUM(len) OVER (PARTITION BY doc_id ORDER BY i) AS INT) AS c
        |  FROM pieces),
        |n_of AS (SELECT doc_id, MAX(i) AS n FROM cum2 GROUP BY doc_id),
        |e2 AS (
        |  SELECT s.doc_id, s.i AS s, MAX(e.i) AS e
        |  FROM cum2 s JOIN cum2 e ON e.doc_id = s.doc_id AND e.i >= s.i
        |    AND e.c - (s.c - s.len) <= 120
        |  GROUP BY s.doc_id, s.i),
        |nxt AS (
        |  SELECT w.doc_id, w.s, MIN(k.i) AS k
        |  FROM e2 w
        |  JOIN n_of nf ON nf.doc_id = w.doc_id AND w.e < nf.n
        |  JOIN cum2 ec ON ec.doc_id = w.doc_id AND ec.i = w.e
        |  JOIN cum2 nl ON nl.doc_id = w.doc_id AND nl.i = w.e + 1
        |  JOIN cum2 k ON k.doc_id = w.doc_id AND k.i > w.s AND k.i <= w.e + 1
        |    AND (ec.c - (k.c - k.len)) <= 30
        |    AND ((ec.c - (k.c - k.len)) + nl.len <= 120 OR (ec.c - (k.c - k.len)) = 0)
        |  GROUP BY w.doc_id, w.s),
        |walk(doc_id, idx, s) AS (
        |  SELECT doc_id, 0, 1 FROM documents
        |  UNION ALL
        |  SELECT w.doc_id, w.idx + 1, nx.k
        |  FROM walk w JOIN nxt nx ON nx.doc_id = w.doc_id AND nx.s = w.s),
        |out AS (
        |  SELECT w.doc_id, w.idx AS chunk_idx,
        |    CASE WHEN w.s = 1
        |      THEN substring(d.text, 1, ec.c)
        |      ELSE substring(d.text, sc.c - sc.len + 2, ec.c - (sc.c - sc.len) - 1)
        |    END AS chunk
        |  FROM walk w
        |  JOIN e2 ee ON ee.doc_id = w.doc_id AND ee.s = w.s
        |  JOIN cum2 ec ON ec.doc_id = w.doc_id AND ec.i = ee.e
        |  JOIN cum2 sc ON sc.doc_id = w.doc_id AND sc.i = w.s
        |  JOIN documents d ON d.doc_id = w.doc_id)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(length(chunk) AS INT) AS chunk_len,
        |  substring(sha256(chunk), 1, 16) AS fp
        |FROM out ORDER BY doc_id, chunk_idx""".stripMargin,
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
