package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ingest.IngestPipeline
import graft.store.ChunkStore

/** Streaming ingest: the reference's per-request upload handler
  * (/root/reference/app.py:352-391) as a continuous flow. Uploads land as
  * (path, user, content) rows in a parquet landing zone; each micro-batch
  * runs the SAME IngestPipeline as batch ingest and appends accepted
  * chunks to the partitioned ChunkStore.
  *
  * `foreachBatch` is the right binding here (not a plain streaming sink)
  * because the pipeline needs a stream-vs-current-store anti-join and a
  * partitioned append — both batch operations per micro-batch.
  *
  * Delivery contract: at-least-once PROCESSING with an exactly-once store
  * EFFECT. Parquet append is not atomic, so a crash mid-append can leave a
  * file's chunks partially written; replay must complete them, not drop
  * them. The file-level (user, file_hash) gate cannot distinguish a
  * partial file from a complete one, so the micro-batch dedups at CHUNK
  * granularity instead: chunk_id = xxhash64(user, file_hash, chunk_seq)
  * is deterministic, and an anti-join against the store's chunk_id set
  * appends exactly the missing chunks — a replayed batch re-parses but
  * re-writes nothing already present, and a half-written file is healed.
  * (Batch-mode ingest keeps the cheaper file-level gate: its single-shot
  * callers re-run the whole job on failure.)
  *
  * 100 TB shape: the anti-join shuffles only chunk_id longs on the batch
  * side; the store side is a column-pruned chunk_id scan of the partitions
  * AQE selects. The parse/chunk/embed stages stay narrow per-file maps.
  */
object StreamingIngest {

  /** Start the ingest stream. `landingDir` must contain/receive parquet
    * with schema (path string, user string, content binary). */
  def start(spark: SparkSession, landingDir: String, storeDir: String,
      checkpointDir: String): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("user", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    spark.readStream.schema(schema).parquet(landingDir)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val store =
          if (ChunkStore.isEmpty(spark, storeDir)) None
          else Some(ChunkStore.load(spark, storeDir))
        // store=None: skip the file-level gate — chunk-level dedup below
        // subsumes it and additionally heals partially-appended files
        val result = IngestPipeline.ingest(spark, batch, None)
        try {
          val accepted = result.chunks
          val fresh = store match {
            case Some(s) =>
              accepted.join(s.select("chunk_id"), Seq("chunk_id"), "left_anti")
            case None => accepted
          }
          if (!fresh.isEmpty) ChunkStore.append(fresh, storeDir)
        } finally result.release()
      }
      .start()
  }
}
