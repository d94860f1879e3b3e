package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed corpus sources — the engine-side S1/S2 surface
  * (/root/reference/helper/multiple_document_upload.py:36-62 loader
  * factory; app.py:362-363 upload landing), expressed as Spark readers so
  * a 100 TB landing zone is scanned in parallel with schema projection and
  * (for structured formats) predicate pushdown.
  */
object Sources {

  /** Landing-zone scan: every file under `dir` as an upload row ready for
    * IngestPipeline.ingest — (path, user, content). binaryFile gives
    * distributed reads with per-file rows; `user` is the authenticated
    * uploader (one landing dir per tenant, or pass a column). */
  def uploadsFromDirectory(spark: SparkSession, dir: String, user: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), lit(user).as("user"), col("content"))

  /** JSONL corpus shards (the standard training-data interchange format —
    * an extension beyond the reference's 12 upload formats): one JSON
    * object per line, `textField` carrying the document body. Returns
    * (path, doc_idx, text); Spark's JSON reader parallelizes per shard and
    * prunes to the requested field. */
  def jsonlDocuments(spark: SparkSession, pattern: String,
      textField: String = "text"): DataFrame =
    spark.read.json(pattern)
      .withColumn("path", input_file_name())
      .withColumn("doc_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("path")).orderBy(monotonically_increasing_id())))
      .select(col("path"), col("doc_idx"), col(textField).as("text"))

  /** CSV corpus read with the distributed reader (vs the per-file parser in
    * IngestPipeline, which mirrors the reference's row-document loader):
    * header-aware, schema-projected, splittable. */
  def csvDocuments(spark: SparkSession, pattern: String,
      textField: String): DataFrame =
    spark.read.option("header", "true").csv(pattern)
      .withColumn("path", input_file_name())
      .select(col("path"), col(textField).as("text"))

  /** ORC interchange: Spark's second built-in columnar format, with the
    * same predicate-pushdown/column-pruning behavior as parquet — for
    * corpora arriving from Hive-era pipelines. Write partitions like the
    * parquet store; read is a drop-in scan. */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  def orcDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
