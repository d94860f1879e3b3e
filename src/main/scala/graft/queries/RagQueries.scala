package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.VectorOps

/** Declared (oracle-checked) forms of the RAG retrieval flow — context
  * assembly (Q2), prompt construction (Q3 minus the external LLM), tenant-
  * scoped retrieval (X5), store count (Q4) and delete-by-source (D1) from
  * SURVEY.md §2. The `documents`/`embeddings` fixtures join 1:1 on
  * doc_id = vec_id, standing in for the chunk store; `source` stands in
  * for the tenancy key.
  */
object RagQueries {

  private def sqL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    VectorOps.squaredL2(a, b)

  /** Q1+Q2: top-13 retrieval for the vec_id=0 query, then "\n\n"-joined
    * context in rank order. The rank-ordered aggregation is
    * `array_sort(collect_list(struct(...)))` — deterministic regardless of
    * partitioning, because the sort happens after collection. */
  def ragContext(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val docs = Tables.documents(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val top = emb
      .join(docs, col("vec_id") === col("doc_id"))
      .crossJoin(broadcast(q))
      .select(col("doc_id"), col("text"), sqL2(col("embedding"), col("q_emb")).as("d"))
      .orderBy(col("d").asc, col("doc_id").asc)
      .limit(13)
    top.agg(
      count(lit(1)).as("n_chunks"),
      array_join(
        transform(array_sort(collect_list(struct(col("d"), col("doc_id"), col("text")))),
          s => s.getField("text")),
        "\n\n").as("context"))
  }

  /** Q3: grounded prompt template around the assembled context. */
  def ragPrompt(spark: SparkSession, dir: String): DataFrame =
    ragContext(spark, dir).select(
      format_string(
        "Use ONLY the context below to answer.\n\nContext:\n%s\n\nQuestion: %s\nAnswer:",
        col("context"), lit("what is a table scan")).as("prompt"))

  /** X5: retrieval scoped to one tenant (source='src1') — the filter sits
    * below the scorer, so a partitioned store prunes before scoring. */
  def knnUserScoped(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val docs = Tables.documents(spark, dir).filter(col("source") === "src1")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    emb.join(docs, col("vec_id") === col("doc_id"))
      .crossJoin(broadcast(q))
      .select(col("doc_id"), col("source"), sqL2(col("embedding"), col("q_emb")).as("d"))
      .orderBy(col("d").asc, col("doc_id").asc)
      .limit(5)
      .select(col("doc_id"), col("source"), round(col("d") * 10000).cast("long").as("dist_e4"))
  }

  /** Q4: collection count. */
  def storeCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).agg(count(lit(1)).as("n"))

  /** D1: delete-by-source semantics — deleted count plus surviving
    * per-source counts in one result. */
  def deleteBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val remaining = docs.filter(col("source") =!= "src3")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select(lit("remaining").as("op"), col("source"), col("n"))
    val deleted = docs.filter(col("source") === "src3")
      .agg(count(lit(1)).as("n"))
      .select(lit("deleted").as("op"), lit("src3").as("source"), col("n"))
    remaining.unionAll(deleted).orderBy(col("op"), col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rag_context" -> (ragContext _),
    "rag_prompt" -> (ragPrompt _),
    "knn_user_scoped" -> (knnUserScoped _),
    "store_count" -> (storeCount _),
    "delete_by_source" -> (deleteBySource _)
  )

  private val sqL2Sql =
    "list_sum(list_transform(list_zip(%s, %s), " +
      "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"

  val oracles: Map[String, String] = Map(
    "rag_context" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |top AS (
         |  SELECT d.doc_id, d.text, ${sqL2Sql.format("e.embedding", "q.q_emb")} AS dist
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id CROSS JOIN q
         |  ORDER BY dist, d.doc_id LIMIT 13)
         |SELECT COUNT(*) AS n_chunks,
         |  string_agg(text, chr(10) || chr(10) ORDER BY dist, doc_id) AS context
         |FROM top""".stripMargin,
    "rag_prompt" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |top AS (
         |  SELECT d.doc_id, d.text, ${sqL2Sql.format("e.embedding", "q.q_emb")} AS dist
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id CROSS JOIN q
         |  ORDER BY dist, d.doc_id LIMIT 13),
         |ctx AS (SELECT string_agg(text, chr(10) || chr(10) ORDER BY dist, doc_id) AS context FROM top)
         |SELECT 'Use ONLY the context below to answer.' || chr(10) || chr(10) ||
         |  'Context:' || chr(10) || context || chr(10) || chr(10) ||
         |  'Question: what is a table scan' || chr(10) || 'Answer:' AS prompt
         |FROM ctx""".stripMargin,
    "knn_user_scoped" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |s AS (
         |  SELECT d.doc_id, d.source, ${sqL2Sql.format("e.embedding", "q.q_emb")} AS dist
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id CROSS JOIN q
         |  WHERE d.source = 'src1')
         |SELECT doc_id, source, CAST(round(dist * 10000) AS BIGINT) AS dist_e4
         |FROM s ORDER BY dist, doc_id LIMIT 5""".stripMargin,
    "store_count" -> "SELECT COUNT(*) AS n FROM documents",
    "delete_by_source" ->
      """SELECT 'remaining' AS op, source, COUNT(*) AS n FROM documents
        |WHERE source <> 'src3' GROUP BY source
        |UNION ALL
        |SELECT 'deleted' AS op, 'src3' AS source, COUNT(*) AS n FROM documents
        |WHERE source = 'src3'
        |ORDER BY op, source""".stripMargin
  )
}
