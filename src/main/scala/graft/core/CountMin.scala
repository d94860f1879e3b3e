package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) over long keys as a typed Spark Aggregator — the point-query
  * frequency summary completing the sketch family next to KMV
  * (cardinality), KLL (quantiles) and Space-Saving (heavy hitters). The
  * state is a fixed depth×width counter matrix: partitions fold their
  * keys locally, matrices merge by elementwise addition (commutative,
  * associative — any merge tree yields the identical state), so the
  * shuffle carries depth·width longs per partition regardless of input
  * size, and a point estimate is min over rows of the row's counter.
  *
  * Guarantees (CmsSpec pins each): every estimate is ≥ the true count
  * (counters only ever add); with depth d and width w the overestimate
  * exceeds 2n/w on at most a (1/2)^d fraction of keys in expectation.
  * Row 0 hashes by plain mod — so with width ≥ the key domain it is
  * collision-free and min(exact, over-estimates) is EXACT: the lossless
  * parameterization the oracle-checked `cms_counts` query runs (the
  * same exact-below-capacity oracle regime as KMV/KLL/Space-Saving).
  * Rows 1+ use fixed-seed splitmix64 mixing — deterministic across
  * JVMs/runs, no Object.hashCode anywhere.
  */
object CountMin {

  /** Counter index of `x` in row `r`. Row 0 is plain floorMod — the
    * collision-free row when width ≥ the key domain. */
  def index(r: Int, x: Long, width: Int): Int =
    if (r == 0) java.lang.Math.floorMod(x, width.toLong).toInt
    else {
      // splitmix64 finalizer with a per-row seed: fixed, well-mixed,
      // pairwise-decorrelated rows for the union-bound argument
      var z = x + 0x9E3779B97F4A7C15L * (r + 1)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      java.lang.Math.floorMod(z, width.toLong).toInt
    }

  /** Point estimate: min over rows. */
  def estimate(counts: Array[Long], depth: Int, width: Int, x: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + index(r, x, width))
      if (c < best) best = c
      r += 1
    }
    best
  }
}

/** The Aggregator: fold longs into the counter matrix. The buffer is a
  * mutable array — reduce/merge update in place, which Spark's typed
  * Aggregator contract allows (the buffer is partition-local). */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 2, s"degenerate sketch ${depth}x$width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    var r = 0
    while (r < depth) {
      b(r * width + CountMin.index(r, x, width)) += 1
      r += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
