package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007; the
  * industry-standard register form, public) — the fixed-size sibling of
  * the repo's KMV family: m = 2^p one-byte registers, each holding the
  * max leading-zero rank seen in its substream, merged by elementwise
  * MAX — an idempotent, commutative, associative monoid, so Spark
  * partial-aggregates it map-side and re-aggregation/backfill can never
  * double-count (the property plain COUNT DISTINCT loses the moment the
  * exact set stops fitting anywhere). 1 KB per group at p=10 regardless
  * of stream size; relative error ≈ 1.04/√m (~3.25% at p=10).
  *
  * Where KMV ([[KmvDistinct]]) keeps the k smallest hashes (exact below
  * k, and supports intersection algebra), HLL's registers are smaller
  * and union-only — the trade warehouses expose as two sketch types.
  * Hashing is the repo's splitmix64 (deterministic across JVMs); the
  * estimator applies the standard bias correction with the
  * linear-counting small-range regime (HllSpec pins the error envelope
  * and merge associativity; the declared query cross-checks the
  * estimate against exact COUNT DISTINCT under the oracle gate). */
class HllAgg(p: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(b: Array[Byte], a: Long): Array[Byte] = {
    val h = Hll.splitmix64(a)
    val idx = (h >>> (64 - p)).toInt
    // rank of the first 1-bit in the remaining 64-p bits (1-based);
    // an all-zero remainder gets the max rank 64-p+1
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p + 1
                else java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
    if (rank > b(idx)) b(idx) = rank
    b
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}

object Hll {
  /** splitmix64 finalizer — the repo's standard deterministic scrambler. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Standard HLL estimator over a register array: bias-corrected
    * harmonic mean, with the linear-counting regime when the raw
    * estimate is small and empty registers remain (the case where
    * linear counting is strictly more accurate). No 32-bit large-range
    * correction: the hash is 64-bit, collisions are negligible. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
