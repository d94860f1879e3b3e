package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Equal-frequency bucket boundaries over an integer sort key — the
  * aggregate half of the scale-safe `ntile` plan (boundaries-then-assign:
  * this computes, per group, the LAST key of each of the first
  * `buckets−1` ntile buckets; a broadcast join + a 3-element array scan
  * then assigns every row its bucket map-side). The direct
  * `ntile(n) OVER (PARTITION BY segment ORDER BY …)` forces each
  * segment's ENTIRE population through one reducer's sort — with a
  * handful of enum-valued segments that is a single-machine bottleneck
  * that grows linearly with the table.
  *
  * Reuses the [[KllQuantile]] buffer machinery, so the state story is the
  * same: below `k` items the buffer never compacts and the boundaries are
  * EXACT ntile semantics (bucket sizes ⌈n/b⌉ for the first n mod b
  * buckets, ⌊n/b⌋ for the rest — which keeps the `ntile_buckets` declared
  * query hash-checkable against DuckDB's window ntile); above `k` the
  * boundaries are weighted-rank estimates inside the KLL envelope with
  * O(k·log n) state — the 100 TB configuration, where approximate
  * equal-frequency strata are what a curriculum/AB split actually needs.
  *
  * Keys must stay within ±2^53 (exactly representable as Double, which
  * the buffer stores); callers packing composite sort keys must respect
  * that — enforced per row.
  */
class NtileBoundaries(buckets: Int, k: Int)
    extends Aggregator[Long, KllBuffer, Seq[Long]] {
  require(buckets >= 2, s"need at least 2 buckets (got $buckets)")
  private val MaxAbsKey = 1L << 53

  /** quantile list is irrelevant — only the buffer machinery is used */
  private val kll = new KllQuantile(k, Seq(0.5))

  override def zero: KllBuffer = kll.zero

  override def reduce(b: KllBuffer, x: Long): KllBuffer = {
    // the Long.MinValue check is load-bearing: math.abs(Long.MinValue)
    // is NEGATIVE (two's complement has no positive counterpart), so it
    // would slip under the magnitude guard and convert lossily
    require(x != Long.MinValue && math.abs(x) < MaxAbsKey,
      s"sort key $x exceeds 2^53 and would lose precision in the buffer")
    kll.reduce(b, x.toDouble)
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = kll.merge(a, b)

  /** `buckets−1` boundary keys, ascending; boundary i is the largest key
    * of bucket i+1 (empty trailing buckets repeat the last key, which the
    * strictly-below assignment scan then skips naturally). */
  override def finish(b: KllBuffer): Seq[Long] = {
    if (b.n == 0) return Seq.empty
    val base = b.n / buckets
    val rem = b.n % buckets
    val cums = (1 until buckets).map(i => base * i + math.min(i.toLong, rem))
    if (b.flips == 0) {
      // lossless regime: exact order statistics
      val s = b.levels.head.toArray
      java.util.Arrays.sort(s)
      cums.map(c => s((c - 1).toInt).toLong)
    } else {
      // sketch regime: smallest retained value whose cumulative weight
      // covers the boundary rank
      val items = b.levels.iterator.zipWithIndex
        .flatMap { case (lv, i) => lv.iterator.map(v => (v, 1L << i)) }
        .toArray.sortBy(_._1)
      cums.map { c =>
        val target = c - 1
        var cum = 0L; var i = 0
        while (i < items.length - 1 && cum + items(i)._2 <= target) {
          cum += items(i)._2; i += 1
        }
        items(i)._1.toLong
      }
    }
  }

  override def bufferEncoder: Encoder[KllBuffer] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
