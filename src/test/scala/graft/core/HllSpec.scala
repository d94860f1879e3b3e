package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog estimator envelope, merge algebra, and determinism —
  * pure-JVM (the Spark partial-aggregate path is exercised by the
  * oracle-gated `hll_distinct` query). */
class HllSpec extends AnyFunSuite {

  private def sketchOf(ids: Iterable[Long], p: Int = 10): Array[Byte] = {
    val agg = new HllAgg(p)
    ids.foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
  }

  test("bias-corrected regime: 3-sigma envelope holds at cardinalities far past m") {
    val p = 10
    val sigma = 1.04 / math.sqrt(1 << p)
    // several disjoint cardinalities, deterministic ids
    Seq(20000, 100000, 500000).foreach { n =>
      val est = Hll.estimate(sketchOf((0 until n).map(i => i * 2654435761L + n)))
      assert(math.abs(est - n) <= 3 * sigma * n,
        s"n=$n est=$est outside 3σ=${3 * sigma * n}")
    }
  }

  test("linear-counting regime: small cardinalities estimate within 5 percent") {
    Seq(10, 150, 800).foreach { n =>
      val est = Hll.estimate(sketchOf((0 until n).map(i => i * 7919L + 13)))
      assert(math.abs(est - n) <= math.max(2.0, 0.05 * n), s"n=$n est=$est")
    }
  }

  test("merge equals single-pass: split any which way, same registers") {
    val ids = (0 until 50000).map(i => (i * 1103515245L) % 37777L) // heavy dups
    val whole = sketchOf(ids)
    val agg = new HllAgg(10)
    val parts = ids.grouped(7919).map(sketchOf(_)).toSeq
    val merged = parts.foldLeft(agg.zero)(agg.merge)
    assert(merged.toSeq == whole.toSeq, "register-max merge must be order-free")
    assert(Hll.estimate(merged) == Hll.estimate(whole))
  }

  test("idempotent under duplication: re-adding the same ids changes nothing") {
    val ids = (0 until 1000).map(_.toLong)
    val once = sketchOf(ids)
    val thrice = sketchOf(ids ++ ids ++ ids)
    assert(once.toSeq == thrice.toSeq)
  }

  test("rank saturates, never overflows the register byte") {
    // ids engineered irrelevant: rank caps at 64 - p + 1
    val p = 10
    val agg = new HllAgg(p)
    val b = (0L until 100000L).foldLeft(agg.zero)((acc, a) => agg.reduce(acc, a))
    assert(b.forall(r => r >= 0 && r <= 64 - p + 1))
  }
}
