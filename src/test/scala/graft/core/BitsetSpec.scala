package graft.core

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dense ([[BitsetAgg]]) vs roaring ([[RoaringBuf]]/[[RoaringAgg]])
  * container equality, array→bitmap promotion, and the sparse-domain
  * memory bound the round-9 verdict asked for. */
class BitsetSpec extends SparkSpec {
  import spark.implicits._

  private def denseOf(ids: Seq[Long], nBits: Int): Array[Long] = {
    val agg = new BitsetAgg(nBits)
    ids.foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
  }

  private def roaringOf(ids: Seq[Long]): Array[Byte] = {
    val b = new RoaringBuf
    ids.foreach(b.add)
    b.serialize()
  }

  test("dense and roaring agree on popcount/and/or over random overlapping sets") {
    val rnd = new scala.util.Random(7L)
    val nBits = 50000
    val a = Seq.fill(3000)(rnd.nextInt(nBits).toLong)
    val b = Seq.fill(3000)(rnd.nextInt(nBits).toLong)
    val (da, db) = (denseOf(a, nBits), denseOf(b, nBits))
    val (ra, rb) = (roaringOf(a), roaringOf(b))
    assert(Roaring.popcount(ra) == Bitset.popcount(da))
    assert(Roaring.popcount(rb) == Bitset.popcount(db))
    assert(Roaring.andCount(ra, rb) == Bitset.andCount(da, db))
    assert(Roaring.orCount(ra, rb) == Bitset.orCount(da, db))
    assert(Roaring.andNotCount(ra, rb) ==
      Bitset.popcount(da) - Bitset.andCount(da, db))
    // ground truth, independently of both containers
    assert(Roaring.popcount(ra) == a.distinct.size)
    assert(Roaring.andCount(ra, rb) == a.toSet.intersect(b.toSet).size)
  }

  test("array container promotes to bitmap past 4096 entries; equality survives") {
    // 5000 ids inside ONE 2^16 block forces promotion mid-stream
    val ids = (0L until 5000L).map(_ * 13 % 65536).distinct
    val r = roaringOf(ids)
    val kind = r(8) // int32 n, int32 key, then the kind byte
    assert(kind == 1, s"a ${ids.size}-entry container must be a bitmap, kind=$kind")
    assert(Roaring.popcount(r) == ids.size)
    val dense = denseOf(ids, 65536)
    assert(Roaring.andCount(r, roaringOf(ids.take(100))) ==
      Bitset.andCount(dense, denseOf(ids.take(100), 65536)))
    // merge of two array containers past the threshold promotes too
    val b1 = new RoaringBuf; val b2 = new RoaringBuf
    (0 until 3000).foreach(i => b1.add(i.toLong))
    (2000 until 6000).foreach(i => b2.add(i.toLong))
    val m = b1.mergeIn(b2).serialize()
    assert(m(8) == 1 && Roaring.popcount(m) == 6000)
  }

  test("sparse 1e9-id domain: memory sizes with the set, not the domain") {
    val rnd = new scala.util.Random(11L)
    val domain = 1000000000L
    val ids = Seq.fill(20000)((rnd.nextLong() % domain).abs)
    val r = roaringOf(ids)
    assert(Roaring.popcount(r) == ids.distinct.size)
    val denseBytes = (domain + 7) / 8 // what BitsetAgg would allocate: 125 MB
    assert(r.length < (1 << 20),
      s"20k members over a 1e9 domain must stay under 1 MB, got ${r.length}")
    assert(r.length.toLong * 100 < denseBytes,
      s"roaring (${r.length} B) must be ≥100× under dense ($denseBytes B)")
  }

  test("RoaringAgg through a shuffled groupBy equals BitsetAgg on the fixture events") {
    val nBits = 1 << 16
    val ev = graft.Tables.events(spark, sfDir).filter(col("value") > 200)
      .repartition(4) // make partial-aggregate merge paths real
    val dense = ev.groupBy(col("event_type"))
      .agg(udaf(new BitsetAgg(nBits), Encoders.scalaLong)(col("user_id")).as("bm"))
      .as[(String, Array[Long])].collect().toMap
    val sparse = ev.groupBy(col("event_type"))
      .agg(udaf(new RoaringAgg, Encoders.scalaLong)(col("user_id")).as("bm"))
      .as[(String, Array[Byte])].collect().toMap
    assert(dense.keySet == sparse.keySet && dense.nonEmpty)
    dense.keySet.foreach { k =>
      assert(Roaring.popcount(sparse(k)) == Bitset.popcount(dense(k)), k)
    }
    for (a <- dense.keySet; b <- dense.keySet if a < b) {
      assert(Roaring.andCount(sparse(a), sparse(b)) ==
        Bitset.andCount(dense(a), dense(b)), s"$a ∩ $b")
      assert(Roaring.orCount(sparse(a), sparse(b)) ==
        Bitset.orCount(dense(a), dense(b)), s"$a ∪ $b")
    }
  }

  test("serialized form is canonical: same set, any insertion/merge order, same bytes") {
    val ids = (0L until 3000L).map(i => (i * 7919) % 100000)
    val byOrder = roaringOf(ids)
    val reversed = roaringOf(ids.reverse)
    val viaMerge = {
      val (l, r) = ids.splitAt(1000)
      val b1 = new RoaringBuf; l.foreach(b1.add)
      val b2 = new RoaringBuf; r.foreach(b2.add)
      b1.mergeIn(b2).serialize()
    }
    assert(byOrder.toSeq == reversed.toSeq)
    assert(byOrder.toSeq == viaMerge.toSeq)
  }
}
