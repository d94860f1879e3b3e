package graft.scale

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.core.{CountMin, CountMinAgg}

/** Property tests for the driver-free cores of the round-5 primitives:
  * Count-Min invariants over arbitrary streams, and NSW graph build/beam
  * invariants over random vector sets (the guarded-connectivity theorem
  * `nsw_precision` relies on, exercised across random geometries instead
  * of one fixture). */
object CountMinProps extends Properties("CountMin") {

  private val streamGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L))

  property("estimates never undercount, at any geometry") =
    forAll(streamGen, Gen.chooseNum(1, 4), Gen.chooseNum(2, 64)) { (xs, d, w) =>
      val agg = new CountMinAgg(d, w)
      val sk = xs.foldLeft(agg.zero)(agg.reduce)
      val truth = xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      truth.forall { case (x, n) => CountMin.estimate(sk, d, w, x) >= n }
    }

  property("lossless when row 0 covers the domain") =
    forAll(streamGen) { xs =>
      val (d, w) = (3, 128) // domain [-50, 50] → 101 < 128 distinct mod slots
      val agg = new CountMinAgg(d, w)
      val sk = xs.foldLeft(agg.zero)(agg.reduce)
      val truth = xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      truth.forall { case (x, n) => CountMin.estimate(sk, d, w, x) == n }
    }

  property("any split-merge equals the single fold") =
    forAll(streamGen, Gen.chooseNum(0, 100)) { (xs, cut) =>
      val agg = new CountMinAgg(2, 32)
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      merged.toSeq == xs.foldLeft(agg.zero)(agg.reduce).toSeq
    }
}

object NswProps extends Properties("Nsw") {

  private val itemsGen: Gen[Array[(Long, Array[Float])]] = for {
    n <- Gen.chooseNum(1, 40)
    vecs <- Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-100, 100).map(_ / 10.0f)))
  } yield vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }.toArray

  private val qGen: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.chooseNum(-100, 100).map(_ / 10.0f)).map(_.toArray)

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i).toDouble - b(i); d += t * t; i += 1 }
    d
  }

  property("every node reachable from the entry (guarded parent edges)") =
    forAll(itemsGen) { items =>
      val adj = Nsw.buildShardGraph(items, m = 3, efConstruction = 8).toMap
      val entry = items.map(_._1).min
      val seen = scala.collection.mutable.Set(entry)
      val stack = scala.collection.mutable.Stack(entry)
      while (stack.nonEmpty)
        adj(stack.pop()).foreach(v => if (seen.add(v)) stack.push(v))
      seen.size == items.length
    }

  property("unbounded beam is exhaustive and exactly (dist, id)-ordered") =
    forAll(itemsGen, qGen) { (items, q) =>
      val adjArr = Nsw.buildShardGraph(items, m = 3, efConstruction = 8)
      val vecs = new java.util.HashMap[Long, Array[Float]]()
      items.foreach { case (id, v) => vecs.put(id, v) }
      val adj = adjArr.toMap
      val got = Nsw.beamSearch(vecs, adj(_), items.map(_._1).min, q, Int.MaxValue)
      val want = items.map { case (id, v) => (id, sqDist(v, q)) }
        .sortBy { case (id, d) => (d, id) }.toIndexedSeq
      got == want
    }
}
