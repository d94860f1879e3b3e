package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor; at cluster scale the
  * same call works on a partitioned directory — `spark.read.parquet` handles
  * both, and Catalyst pushes filters/projections into the scan either way.
  */
object Tables {
  // Loader memo: `spark.read.parquet` pays a driver-side file listing +
  // footer schema inference on EVERY call, and the bench's 400 queries
  // call these loaders thousands of times per session. The memo reuses
  // the immutable LOGICAL PLAN (never data — execution still scans
  // parquet every time), keyed by session so a restarted session
  // re-lists. NOTE (ADVICE r16): the weak keys do NOT let closed
  // sessions unload — the cached Dataset values strongly reference
  // their session, so the memo pins each session's plans for the JVM
  // lifetime. Every driver entry point here is one session per JVM, so
  // that is a documented bound, not a leak; a long-lived multi-session
  // host would need value-side WeakReferences instead.
  private val frames = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]])
  private def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    var m = frames.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
      frames.put(spark, m)
    }
    m.getOrElseUpdate(key, build)
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, s"$dir/$name.parquet")(spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
  /** `events.ts` arrives in whatever physical type the generator's parquet
    * writer chose: TIMESTAMP(NANOS) (vectorized reader rejects it — read
    * nanos as longs and integer-divide; ns epoch values exceed 2^53, so a
    * double-valued division would corrupt them) or naive TIMESTAMP(MICROS)
    * (Spark reads TIMESTAMP_NTZ, which the micros/epoch functions reject —
    * reinterpret in the session zone, pinned to UTC everywhere, matching
    * DuckDB's UTC epoch view of the same naive values). */
  def events(spark: SparkSession, dir: String): DataFrame = memo(spark, s"$dir#events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // bypass the raw-table memo: the nanosAsLong conf must be set BEFORE
    // the first footer inference of events.parquet or the read throws
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
