package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ingest.IngestPipeline
import graft.store.ChunkStore

/** Streaming ingest: the reference's per-request upload handler
  * (/root/reference/app.py:352-391) as a continuous flow. Uploads land as
  * (path, user, content) rows in a parquet landing zone; each micro-batch
  * runs the SAME IngestPipeline as batch ingest — including the
  * file_hash dedup gate against the store as it exists at that moment —
  * and appends accepted chunks to the partitioned ChunkStore.
  *
  * `foreachBatch` is the right binding here (not a plain streaming sink)
  * because the pipeline needs a stream-vs-current-store anti-join and a
  * partitioned append — both batch operations per micro-batch. Exactly-once
  * comes from the checkpoint + idempotent dedup: a replayed batch is
  * rejected by its own file hashes.
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
        val result = IngestPipeline.ingest(spark, batch, store)
        try {
          val accepted = result.chunks
          if (!accepted.isEmpty) ChunkStore.append(accepted, storeDir)
        } finally result.release()
      }
      .start()
  }
}
