package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustered parquet layouts: range clustering and Z-order (Morton)
  * interleaving, so that parquet footer min/max statistics turn range
  * predicates into file- and row-group-level skips.
  *
  * Why this matters at 100 TB: directory partitioning (ChunkStore's
  * user/source) prunes only on the partition keys, and only at directory
  * granularity — a predicate on a non-partition column (time range, id
  * range) still scans every file. Clustering the rows WITHIN the table by
  * the query columns narrows each file's min/max envelope so the scan
  * planner skips the files (and the reader skips the row groups) whose
  * stats cannot match. Range clustering optimizes one sort dimension;
  * Z-ordering interleaves the bits of two dimensions so BOTH stay
  * locally narrow — the standard layout for (tenant, time)-style boxes.
  *
  * The Morton encoding is pure bitwise Column algebra (five mask-and-
  * shift rounds per dimension) — whole-stage-codegen'd, no UDF.
  */
object Clustered {

  /** Spread the low 32 bits of `c` to the even bit positions of a long:
    * bit i moves to bit 2i. Standard Morton magic-mask sequence. */
  def spread32(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton code: interleaved bits of two 32-bit dimensions, x in the
    * even positions, y in the odd. Monotone in each dimension when the
    * other is fixed, and contiguous z-ranges cover compact 2-D boxes. */
  def zorder2(x: Column, y: Column): Column =
    spread32(x).bitwiseOR(shiftleft(spread32(y), 1))

  /** Write `df` range-clustered on `cols` into `numFiles` files: a range
    * shuffle assigns contiguous key ranges to tasks, an intra-partition
    * sort makes every row group's min/max envelope tight. One shuffle,
    * same cost class as any repartition — paid once at write time, saved
    * on every subsequent scan. */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int, cols: Column*): Unit =
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)

  /** `df` arranged for a Z-ordered layout on two integer dimensions: the
    * interleave column exists only inside the plan (projected away
    * before writing — the projection preserves the sort). Callers pick
    * the writer: [[writeZOrdered]] (native) or the store's staging seam
    * (which must keep array-bearing tables connector-shaped). */
  def zOrdered(df: DataFrame, numFiles: Int, x: Column, y: Column): DataFrame = {
    val cols = df.columns.map(col).toSeq
    df.withColumn("__z", zorder2(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(cols: _*)
  }

  /** Write `df` Z-ordered on two integer dimensions. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int, x: Column, y: Column): Unit =
    zOrdered(df, numFiles, x, y).write.mode("overwrite").parquet(path)

  /** Per-file min/max envelopes for `cols` — the same statistics the
    * parquet footer exposes to the scan planner, observable from SQL via
    * input_file_name(). A file whose envelope misses the predicate box is
    * a file the scan never opens; [[ClusteredSpec]] and SCALE.md use this
    * to count skippable files per layout. */
  def fileEnvelopes(df: DataFrame, cols: String*): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }
}
