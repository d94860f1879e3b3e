package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct-count sketch (Bar-Yossef et al. 2002;
  * the "bottom-k" mergeable summary). The buffer is the k smallest
  * distinct 64-bit hash values seen; merge is a sorted-set union trimmed
  * to k — associative, commutative, idempotent on duplicates, so any
  * partial-aggregation tree over any partitioning yields the same sketch.
  *
  * Estimator: with the k-th minimum at unsigned position u of the 2⁶⁴
  * hash space, distinct ≈ (k-1) · 2⁶⁴ / u. While FEWER than k distinct
  * hashes exist the sketch is lossless and the count is EXACT — the
  * full-recall parameterization that keeps the `kmv_distinct` declared
  * query DuckDB-oracle-checkable (k ≥ true cardinality ⇒ == COUNT
  * (DISTINCT)); KmvSketchSpec pins the small-k relative-error contract
  * the 100 TB configuration (k ≪ n, fixed 8·k bytes per group) relies on.
  *
  * vs HyperLogLog (`approx_count_distinct`): KMV keeps actual hash
  * samples, so sketches of different groups ALSO estimate union and
  * intersection sizes (Jaccard between groups) — the sketch a dedup
  * pipeline can reuse for cross-partition overlap triage.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, Seq[Long], Long] {
  require(k > 1, "k must exceed 1 (the estimator divides by the k-th minimum)")

  /** splitmix64 finalizer — full-avalanche 64-bit mix, deterministic
    * across JVMs/partitionings (no engine hash dependence). */
  private def h64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def zero: Seq[Long] = Vector.empty

  /** Amortized append-and-compact: the working buffer is (canonical
    * bottom-k prefix) ++ (unsorted append tail), compacted back to
    * canonical form whenever the tail reaches k. A per-row sorted
    * INSERT (the previous form) copies O(k) on every new minimum —
    * O(NDV·k) element copies to build a lossless sketch, which is
    * exactly the regime the `table_stats_sketch` row runs in (k ≥
    * NDV ⇒ every distinct value inserts). Appending is O(1) and each
    * compaction is one O(k log k) sort per k appends, so the build is
    * O(n log k) regardless of how many rows insert. The sketch VALUE
    * is unchanged: bottom-k-distinct is a pure set function of the
    * inputs, so any append/compact schedule yields the same canonical
    * sketch (KmvSketchSpec pins reduce-vs-sketchOf equality). */
  override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    val appended = b :+ h64(a)
    if (appended.length >= 2 * k) compact(appended) else appended
  }

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    compact(b1 ++ b2)

  override def finish(b: Seq[Long]): Long = {
    val c = compact(b)
    if (c.size < k) c.size.toLong // lossless regime: exact distinct count
    else {
      // k-th minimum as an UNSIGNED fraction of the 2⁶⁴ hash space (only
      // negative longs wrap by 2⁶⁴ — a global shift would halve the space)
      val kth = c.last
      val u = if (kth >= 0) kth.toDouble else kth.toDouble + math.pow(2.0, 64)
      math.round((k - 1).toDouble * math.pow(2.0, 64) / u)
    }
  }

  /** Canonical form: distinct hashes in unsigned ascending order,
    * trimmed to the k smallest. Idempotent; `sketchOf` produces it
    * directly and `merge`/`finish` restore it after appends. */
  private[core] def compact(b: Seq[Long]): Seq[Long] =
    if (b.isEmpty) b
    else {
      val arr = b.toArray
      java.util.Arrays.sort(arr) // signed: negatives (unsigned top half) first
      val (neg, pos) = arr.partition(_ < 0)
      (pos.iterator ++ neg.iterator).distinct.take(k).toVector
    }

  /** Bulk build: sketch a whole batch in O(n log n) instead of n O(k)
    * immutable inserts — the hot path for callers that own the buffer
    * for a batch (e.g. the streaming state processor) rather than going
    * through Spark's per-row Aggregator contract. Produces exactly the
    * sketch `values.foldLeft(zero)(reduce)` would. */
  def sketchOf(values: IterableOnce[Long]): Seq[Long] = {
    val hashed = values.iterator.map(h64).toArray
    java.util.Arrays.sort(hashed) // signed sort: flip halves for unsigned order
    val (neg, pos) = hashed.partition(_ < 0)
    (pos.iterator ++ neg.iterator).distinct.take(k).toVector
  }

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder()
}

/** Same bottom-k state as [[KmvDistinct]] but `finish` returns the
  * SKETCH itself — the handle for sketch SET ALGEBRA: per-group
  * sketches computed in one corpus pass answer every pairwise union
  * (merge) and intersection (inclusion-exclusion over three `finish`
  * calls) from k-sized summaries, instead of one corpus pass per pair.
  * Below k the algebra is EXACT (the lossless regime the
  * `source_overlap` oracle checks); above k it inherits KMV's
  * estimation envelope (KmvSketchSpec). */
class KmvSketchBuffer(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val inner = new KmvDistinct(k)
  override def zero: Seq[Long] = inner.zero
  override def reduce(b: Seq[Long], a: Long): Seq[Long] = inner.reduce(b, a)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = inner.merge(b1, b2)
  // compact: the working buffer may carry an unsorted append tail;
  // consumers of the RETURNED sketch rely on canonical bottom-k form
  override def finish(b: Seq[Long]): Seq[Long] = inner.compact(b)
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
