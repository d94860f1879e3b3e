package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-domain bitmap index aggregate — the bitmap-membership primitive
  * warehouses build per dimension value (Oracle bitmap indexes, Druid,
  * ClickHouse; at web scale the compressed-container form is Roaring,
  * Chambi et al. 2016, public — this is its dense-container case): each
  * group folds member ids into one `Array[Long]` of bit words, OR-merged
  * associatively so Spark partial-aggregates it map-side like any
  * monoid. Set algebra over the RESULTS (AND/OR/ANDNOT popcounts) then
  * costs one word-wise pass over fixed-size summaries, never a re-scan
  * of the fact table — the same summaries-answer-queries economics as
  * the KMV sketch family, but EXACT, for domains small enough to
  * enumerate (8 KB per 64k ids).
  *
  * The buffer is mutated in place (Spark's Aggregator contract allows
  * it); ids outside [0, nBits) fail fast rather than aliasing. */
class BitsetAgg(nBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(nBits > 0, s"nBits must be positive, got $nBits")
  private val words = (nBits + 63) >> 6

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    require(a >= 0 && a < nBits, s"id $a outside the bitmap domain [0, $nBits)")
    b((a >> 6).toInt) |= 1L << (a & 63)
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object Bitset {
  def popcount(b: Array[Long]): Long = {
    var n = 0L; var i = 0
    while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }
  def andCount(a: Array[Long], b: Array[Long]): Long = {
    var n = 0L; var i = 0
    while (i < a.length) { n += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
    n
  }
  def orCount(a: Array[Long], b: Array[Long]): Long = {
    var n = 0L; var i = 0
    while (i < a.length) { n += java.lang.Long.bitCount(a(i) | b(i)); i += 1 }
    n
  }
}
