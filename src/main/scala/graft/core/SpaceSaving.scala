package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One surfaced heavy hitter. */
case class TermCount(term: String, count: Long)

/** Space-Saving heavy hitters (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams", ICDT 2005) as a typed
  * Spark Aggregator: a bounded m-entry summary that admits partial
  * aggregation — each partition streams its terms into a local summary,
  * summaries merge pairwise on the reduce side, so the shuffle carries at
  * most m (term, count) pairs per partition regardless of input size.
  * That bounded-state-through-partial-aggregation shape is exactly what a
  * 100 TB frequent-terms pass needs (an exact groupBy shuffles every
  * distinct term; vocabulary at web scale is billions).
  *
  * Guarantees (the classic ones, pinned in SpaceSavingSpec): every true
  * count is ≤ its estimate, over-estimation is bounded by n/m, and any
  * term with true frequency > n/m is guaranteed present in the summary.
  * With m ≥ the distinct-term count no eviction ever happens anywhere, so
  * the result is EXACT — the full-recall parameterization the
  * heavy_hitters query uses to stay DuckDB-oracle-checkable.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): a key absent from one input summary contributes that
  * summary's minimum count (its eviction error bound — 0 while the
  * summary has never evicted), then the union is trimmed to the m
  * largest. Dropping keys and adding per-summary error bounds both
  * preserve the upper-bound property, and the total over-estimate stays
  * ≤ n/m across any merge tree — the bound SpaceSavingSpec pins.
  */
class SpaceSaving(m: Int) extends Aggregator[String, Map[String, Long], Seq[TermCount]] {
  require(m > 0, "summary capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    b.get(term) match {
      case Some(c) => b.updated(term, c + 1)
      case None if b.size < m => b.updated(term, 1L)
      case None =>
        // evict the minimum (term tie-break for determinism); the new term
        // inherits the evicted count + 1 — the over-estimate that makes
        // the summary's counts upper bounds. The O(m) minBy per eviction
        // is fine at declared capacities; a web-scale m would swap in the
        // stream-summary linked-counter structure (O(1) eviction) behind
        // this same Aggregator interface, as TopKAggregator documents for
        // its heap.
        val (mk, mv) = b.minBy { case (k, v) => (v, k) }
        (b - mk).updated(term, mv + 1)
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    // a summary that has never evicted (size < m) tracks absent keys
    // exactly (count 0); a full one may have evicted a key after counting
    // it up to its minimum — that minimum is the absent-key upper bound,
    // and summing the bounds keeps every estimate an upper bound
    // size < m covers empty too (m > 0), so `values.min` is safe here
    val e1 = if (b1.size < m) 0L else b1.values.min
    val e2 = if (b2.size < m) 0L else b2.values.min
    val sum = (b1.keySet ++ b2.keySet).iterator
      .map(k => k -> (b1.getOrElse(k, e1) + b2.getOrElse(k, e2))).toMap
    if (sum.size <= m) sum
    else sum.toSeq.sortBy { case (k, v) => (-v, k) }.take(m).toMap
  }

  override def finish(b: Map[String, Long]): Seq[TermCount] =
    b.toSeq.map { case (t, c) => TermCount(t, c) }
      .sortBy(tc => (-tc.count, tc.term))

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder()
}
