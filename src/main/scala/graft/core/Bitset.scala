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

/** Array container of a roaring bitmap: sorted unique low-16 values
  * with an explicit count (`a` may carry slack capacity past `n`).
  * Promotes to a dense 1024-word bitmap at 4096 entries — past that
  * the bitmap representation is the smaller one. */
private[core] final class ArrayCont(var a: Array[Char], var n: Int) extends Serializable

/** Roaring-style compressed bitmap (Chambi et al. 2016, public): the id
  * space partitions into 2¹⁶-value blocks keyed by the high bits; each
  * block is EITHER a sorted array of low-16 values (sparse — ≤ 4096
  * entries, ≤ 2 bytes/id) OR a dense 8 KB bit array, whichever is
  * smaller. [[BitsetAgg]]'s fixed `nBits/8`-byte allocation per group is
  * unusable past enumerable domains; this holds memory proportional to
  * the SET, so a 10⁹-id domain with 10⁴ members costs ~10⁴ entries, not
  * 125 MB (BitsetSpec pins the bound and dense==sparse equality).
  * Mutated in place under the Aggregator contract. */
final class RoaringBuf extends Serializable {
  /** high-16 key → ArrayCont | Array[Long](1024); TreeMap keeps key
    * order, which makes [[serialize]] canonical. */
  val containers = new java.util.TreeMap[Integer, AnyRef]()

  def add(id: Long): Unit = {
    require(id >= 0 && (id >>> 16) <= Int.MaxValue,
      s"id $id outside the roaring domain [0, 2^47)")
    val key = (id >>> 16).toInt
    val low = (id & 0xFFFF).toChar
    containers.get(key) match {
      case null =>
        containers.put(key, new ArrayCont(Array(low), 1)): Unit
      case bm: Array[Long] =>
        bm(low >> 6) |= 1L << (low & 63)
      case ac: ArrayCont =>
        val idx = java.util.Arrays.binarySearch(ac.a, 0, ac.n, low)
        if (idx < 0) {
          val at = -idx - 1
          if (ac.n == 4096) { // promote: the bitmap is smaller from here on
            val bm = new Array[Long](1024)
            var i = 0
            while (i < ac.n) { val c = ac.a(i); bm(c >> 6) |= 1L << (c & 63); i += 1 }
            bm(low >> 6) |= 1L << (low & 63)
            containers.put(key, bm): Unit
          } else {
            if (ac.n == ac.a.length) {
              val grown = new Array[Char](math.min(4096, math.max(4, ac.a.length * 2)))
              System.arraycopy(ac.a, 0, grown, 0, ac.n)
              ac.a = grown
            }
            System.arraycopy(ac.a, at, ac.a, at + 1, ac.n - at)
            ac.a(at) = low
            ac.n += 1
          }
        }
    }
  }

  /** OR-merge `o` into this buffer (the Aggregator monoid; `o` is
    * discarded by the caller, so its containers may be adopted). */
  def mergeIn(o: RoaringBuf): RoaringBuf = {
    val it = o.containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey
      (containers.get(key), e.getValue) match {
        case (null, oc) => containers.put(key, oc): Unit
        case (bm: Array[Long], obm: Array[Long]) =>
          var i = 0; while (i < 1024) { bm(i) |= obm(i); i += 1 }
        case (bm: Array[Long], oac: ArrayCont) =>
          var i = 0
          while (i < oac.n) { val c = oac.a(i); bm(c >> 6) |= 1L << (c & 63); i += 1 }
        case (ac: ArrayCont, obm: Array[Long]) =>
          var i = 0
          while (i < ac.n) { val c = ac.a(i); obm(c >> 6) |= 1L << (c & 63); i += 1 }
          containers.put(key, obm): Unit
        case (ac: ArrayCont, oac: ArrayCont) =>
          val merged = new Array[Char](ac.n + oac.n)
          var i = 0; var j = 0; var k = 0
          while (i < ac.n && j < oac.n) {
            val x = ac.a(i); val y = oac.a(j)
            if (x < y) { merged(k) = x; i += 1 }
            else if (y < x) { merged(k) = y; j += 1 }
            else { merged(k) = x; i += 1; j += 1 }
            k += 1
          }
          while (i < ac.n) { merged(k) = ac.a(i); i += 1; k += 1 }
          while (j < oac.n) { merged(k) = oac.a(j); j += 1; k += 1 }
          if (k > 4096) {
            val bm = new Array[Long](1024)
            var t = 0
            while (t < k) { val c = merged(t); bm(c >> 6) |= 1L << (c & 63); t += 1 }
            containers.put(key, bm): Unit
          } else containers.put(key, new ArrayCont(merged, k)): Unit
        case other => throw new IllegalStateException(s"corrupt container: $other")
      }
    }
    this
  }

  /** Canonical portable bytes: containers in key order, arrays sorted
    * and slack-trimmed — same set ⇒ same bytes on any JVM, so results
    * hash-compare across engines. Layout: int32 n; then per container
    * int32 key, int8 kind (0 array | 1 bitmap), int32 count, payload
    * (count uint16s | 1024 int64s). */
  def serialize(): Array[Byte] = {
    var size = 4
    val it0 = containers.values().iterator()
    while (it0.hasNext) size += 9 + (it0.next() match {
      case ac: ArrayCont => 2 * ac.n
      case _ => 8192
    })
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(containers.size())
    val it = containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putInt(e.getKey)
      e.getValue match {
        case ac: ArrayCont =>
          bb.put(0: Byte); bb.putInt(ac.n)
          var i = 0; while (i < ac.n) { bb.putChar(ac.a(i)); i += 1 }
        case bm: Array[Long] =>
          var cnt = 0
          var i = 0; while (i < 1024) { cnt += java.lang.Long.bitCount(bm(i)); i += 1 }
          bb.put(1: Byte); bb.putInt(cnt)
          i = 0; while (i < 1024) { bb.putLong(bm(i)); i += 1 }
      }
    }
    bb.array()
  }
}

/** Roaring-container membership aggregate — [[BitsetAgg]]'s large-domain
  * sibling: same OR-monoid partial aggregation, but the per-group
  * summary sizes with the member set instead of the domain. Finishes to
  * the canonical serialized form ([[RoaringBuf.serialize]]); set
  * algebra over the results goes through [[Roaring]]. */
class RoaringAgg extends Aggregator[Long, RoaringBuf, Array[Byte]] {
  override def zero: RoaringBuf = new RoaringBuf
  override def reduce(b: RoaringBuf, a: Long): RoaringBuf = { b.add(a); b }
  override def merge(b1: RoaringBuf, b2: RoaringBuf): RoaringBuf = b1.mergeIn(b2)
  override def finish(b: RoaringBuf): Array[Byte] = b.serialize()
  // the buffer is a JVM container graph, not a row — serialized opaque
  // between partial and final aggregation (a production tuning would
  // register a kryo serializer; the algebra is unchanged)
  override def bufferEncoder: Encoder[RoaringBuf] =
    org.apache.spark.sql.Encoders.javaSerialization[RoaringBuf]
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}

/** Set algebra over the SERIALIZED roaring form — header-driven
  * merge-walks, no deserialization to container objects. */
object Roaring {
  /** Cardinality: the per-container counts are in the headers. */
  def popcount(b: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val n = bb.getInt
    var total = 0L
    var c = 0
    while (c < n) {
      bb.getInt // key
      val kind = bb.get()
      val cnt = bb.getInt
      total += cnt
      bb.position(bb.position() + (if (kind == 0) 2 * cnt else 8192))
      c += 1
    }
    total
  }

  /** |A ∩ B| by key-ordered merge-walk over both container lists. */
  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = java.nio.ByteBuffer.wrap(a); val na = ba.getInt
    val bbuf = java.nio.ByteBuffer.wrap(b); val nb = bbuf.getInt
    if (na == 0 || nb == 0) return 0L
    var ia = 0; var ib = 0
    var total = 0L
    var ha = nextHeader(ba)
    var hb = nextHeader(bbuf)
    var done = false
    while (!done) {
      if (ha._1 < hb._1) {
        ia += 1
        if (ia < na) ha = nextHeader(ba) else done = true
      } else if (hb._1 < ha._1) {
        ib += 1
        if (ib < nb) hb = nextHeader(bbuf) else done = true
      } else {
        total += containerAnd(a, ha._2, ha._3, ha._4, b, hb._2, hb._3, hb._4)
        ia += 1; ib += 1
        if (ia < na && ib < nb) { ha = nextHeader(ba); hb = nextHeader(bbuf) }
        else done = true
      }
    }
    total
  }

  def orCount(a: Array[Byte], b: Array[Byte]): Long =
    popcount(a) + popcount(b) - andCount(a, b)

  def andNotCount(a: Array[Byte], b: Array[Byte]): Long =
    popcount(a) - andCount(a, b)

  /** Read the header at the buffer's current position (which must sit on
    * a container boundary), returning (key, kind, count, payload offset)
    * and advancing past the payload. */
  private def nextHeader(bb: java.nio.ByteBuffer): (Int, Byte, Int, Int) = {
    val key = bb.getInt
    val kind = bb.get()
    val cnt = bb.getInt
    val off = bb.position()
    bb.position(off + (if (kind == 0) 2 * cnt else 8192))
    (key, kind, cnt, off)
  }

  private def u16(b: Array[Byte], off: Int, i: Int): Int =
    ((b(off + 2 * i) & 0xFF) << 8) | (b(off + 2 * i + 1) & 0xFF)

  private def i64(b: Array[Byte], off: Int, i: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (b(off + 8 * i + k) & 0xFFL); k += 1 }
    v
  }

  private def containerAnd(a: Array[Byte], kinda: Byte, cnta: Int, offa: Int,
      b: Array[Byte], kindb: Byte, cntb: Int, offb: Int): Long =
    (kinda, kindb) match {
      case (0, 0) => // two sorted arrays: two-pointer
        var i = 0; var j = 0; var n = 0L
        while (i < cnta && j < cntb) {
          val x = u16(a, offa, i); val y = u16(b, offb, j)
          if (x < y) i += 1
          else if (y < x) j += 1
          else { n += 1; i += 1; j += 1 }
        }
        n
      case (1, 1) => // two bitmaps: word AND
        var i = 0; var n = 0L
        while (i < 1024) { n += java.lang.Long.bitCount(i64(a, offa, i) & i64(b, offb, i)); i += 1 }
        n
      case (0, 1) => probeArray(a, offa, cnta, b, offb)
      case (1, 0) => probeArray(b, offb, cntb, a, offa)
      case other => throw new IllegalStateException(s"corrupt container kinds: $other")
    }

  /** Array values probed against a bitmap container. */
  private def probeArray(arr: Array[Byte], offArr: Int, cnt: Int,
      bm: Array[Byte], offBm: Int): Long = {
    var i = 0; var n = 0L
    while (i < cnt) {
      val v = u16(arr, offArr, i)
      if ((i64(bm, offBm, v >> 6) & (1L << (v & 63))) != 0) n += 1
      i += 1
    }
    n
  }
}
