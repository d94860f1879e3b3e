package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** (id, distance) candidate for top-k accumulation. */
case class Scored(id: Long, d: Double)

/** Bounded top-k accumulator (SURVEY.md §7.3): keeps only the k best
  * (distance, id) pairs per group through partial aggregation, so
  * per-query top-k needs no per-group sort of all candidates — each
  * partition contributes at most k rows to the shuffle, vs the Window form
  * which shuffles and sorts every candidate. Ascending (d, id) order — the
  * engine's universal deterministic tie-break.
  *
  * The buffer is a sorted Seq: exact and cheap for retrieval-sized k
  * (k=13); a 100 TB variant with large k would swap in a bounded binary
  * heap behind the same Aggregator interface.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] = Ordering.by(s => (s.d, s.id))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.length < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
