package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (one entry per
  * implemented operator from SURVEY.md §2); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query so the driver can hash-compare
  * results at sf0.01 (385 oracle-checked as of round 16). The 15
  * non-SQL-expressible operators (ANN headliners, MinHash/SimHash
  * signatures, learned tokenizer/embedder outputs) are declared without
  * an oracle and pinned by oracle-checked precision twins
  * (`ivf_precision`, `bpe_segments`, …) plus ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact top-13 k-NN — the reference's core retrieval
    * (`similarity_search(k=13)`, /root/reference/app.py:409). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.knnTop13(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (VectorQueries.queries, VectorQueries.oracles),
      (RelationalQueries.queries, RelationalQueries.oracles),
      (EventQueries.queries, EventQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (ChunkQueries.queries, ChunkQueries.oracles),
      (RagQueries.queries, RagQueries.oracles),
      (ScaleQueries.queries, ScaleQueries.oracles),
      (SurfaceQueries.queries, SurfaceQueries.oracles),
      (JoinQueries.queries, JoinQueries.oracles),
      (FuncQueries.queries, FuncQueries.oracles),
      (StoreQueries.queries, StoreQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
      (StatQueries.queries, StatQueries.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
