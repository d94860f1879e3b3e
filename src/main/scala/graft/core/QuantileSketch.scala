package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Sketch buffer: `levels(i)` holds items of weight 2^i (level 0 is the
  * raw stream; each compaction promotes half a level's items one level
  * up, doubling their weight). `n` is the true item count; `flips` counts
  * compactions and doubles as the deterministic coin (alternating parity
  * picks even/odd survivors, cancelling rank bias between successive
  * compactions without randomness — reruns must be bit-identical).
  * `flips == 0` ⇔ nothing was ever compacted ⇔ the sketch is LOSSLESS. */
case class KllBuffer(n: Long, flips: Long, levels: Seq[Seq[Double]])

/** Mergeable quantile sketch — the KLL/MRL family (Karnin-Lang-Liberty
  * 2016; Manku-Rajagopalan-Lindsay 1998) with a fixed per-level capacity
  * `k` and a deterministic compaction coin. Closes the one sketch-family
  * hole next to [[KmvDistinct]] (cardinality) and [[SpaceSaving]] (heavy
  * hitters): per-group quantiles in ONE pass with O(k·log(n/k)) state,
  * where the exact `percentile` needs the whole group sorted on one
  * reducer — the difference between a 100 TB single pass and a
  * per-group total sort.
  *
  * Same oracle regime as KMV: while fewer than `k` items have been seen
  * the buffer never compacts and the sketch is LOSSLESS — quantiles are
  * then the exact linearly-interpolated order statistics (DuckDB
  * `quantile_cont` semantics: position q·(n−1), linear between
  * neighbors), which keeps the `quantile_sketch` declared query
  * hash-checkable against DuckDB. Above `k`, QuantileSketchSpec pins the
  * deterministic worst-case rank envelope ε·n with ε = levels/k (each
  * level-i compaction displaces ranks by ≤ 2^i and happens ≤ n/(k·2^i)
  * times, so the per-level error contributions telescope to n/k each).
  *
  * Merge is buffer concatenation level-by-level followed by the same
  * compaction cascade — associative and commutative up to the compaction
  * schedule, with the error envelope holding under ANY merge tree (the
  * bound counts compactions, not their order); weight is conserved
  * exactly, so `n` and rank targets never drift.
  *
  * The reference has no analytics surface at all (its only statistic is
  * the collection count, /root/reference/app.py:79); this is the
  * corpus-profiling primitive (length/score distributions per shard) a
  * training-data pipeline needs at scale.
  */
class KllQuantile(k: Int, qs: Seq[Double])
    extends Aggregator[Double, KllBuffer, Seq[Double]] {
  require(k >= 8 && k % 2 == 0, s"k must be an even int >= 8 (got $k)")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantiles must lie in [0, 1]")

  override def zero: KllBuffer = KllBuffer(0L, 0L, Vector(Vector.empty))

  override def reduce(b: KllBuffer, x: Double): KllBuffer =
    compact(KllBuffer(b.n + 1, b.flips,
      b.levels.updated(0, b.levels.head :+ x)))

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    val depth = math.max(a.levels.size, b.levels.size)
    val lv = Vector.tabulate(depth)(i => at(a.levels, i) ++ at(b.levels, i))
    compact(KllBuffer(a.n + b.n, a.flips + b.flips, lv))
  }

  override def finish(b: KllBuffer): Seq[Double] =
    if (b.n == 0) qs.map(_ => Double.NaN)
    else if (b.flips == 0) {
      // lossless regime: exact interpolated order statistics, same
      // arithmetic as quantile_cont (and Spark `percentile`): position
      // q·(n−1), linear between the two neighboring values
      val s = b.levels.head.toArray
      java.util.Arrays.sort(s)
      qs.map { q =>
        val pos = q * (s.length - 1)
        val i = math.floor(pos).toInt
        if (i + 1 >= s.length) s(s.length - 1)
        else s(i) + (pos - i) * (s(i + 1) - s(i))
      }
    } else {
      // sketch regime: weighted lower quantile — the smallest value whose
      // cumulative weight covers rank floor(q·(n−1)). No interpolation:
      // between weighted samples it would manufacture precision the
      // sketch doesn't have.
      val items = b.levels.iterator.zipWithIndex
        .flatMap { case (lv, i) => lv.iterator.map(v => (v, 1L << i)) }
        .toArray.sortBy(_._1)
      qs.map { q =>
        val target = math.floor(q * (b.n - 1)).toLong
        var cum = 0L; var i = 0
        while (i < items.length - 1 && cum + items(i)._2 <= target) {
          cum += items(i)._2; i += 1
        }
        items(i)._1
      }
    }

  /** Total retained weight — equals `n` in every state (compaction
    * promotes exact pairs and parks the odd item), the invariant the
    * spec checks across random merge trees. */
  def totalWeight(b: KllBuffer): Long =
    b.levels.iterator.zipWithIndex.map { case (lv, i) => lv.size.toLong << i }.sum

  private def at(lv: Seq[Seq[Double]], i: Int): Seq[Double] =
    if (i < lv.size) lv(i) else Vector.empty

  /** Cascade: any level at/over capacity sorts, promotes alternate
    * elements (parity of `flips` picks even/odd — deterministic), parks
    * the unpaired odd item, and the promotion may trigger the next
    * level in turn. */
  private def compact(b: KllBuffer): KllBuffer = {
    var levels = b.levels.map(_.toVector).toVector
    var flips = b.flips
    var i = 0
    while (i < levels.size) {
      if (levels(i).size >= k) {
        val sorted = levels(i).sorted
        val paired = sorted.size & ~1
        val offset = (flips % 2).toInt
        flips += 1
        val promoted = (offset until paired by 2).map(sorted)
        val leftover =
          if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty[Double]
        if (i + 1 >= levels.size) levels = levels :+ Vector.empty[Double]
        levels = levels
          .updated(i, leftover)
          .updated(i + 1, levels(i + 1) ++ promoted)
      }
      i += 1
    }
    KllBuffer(b.n, flips, levels)
  }

  override def bufferEncoder: Encoder[KllBuffer] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
