package graft.core

import graft.SparkSpec

class NtileBoundariesSpec extends SparkSpec {

  /** ground-truth ntile bucket for 1-based rank r of n rows. */
  private def ntileOf(r: Int, n: Int, buckets: Int): Int = {
    val base = n / buckets; val rem = n % buckets
    var b = 1; var cum = base + (if (rem >= 1) 1 else 0)
    while (r > cum) { b += 1; cum += base + (if (rem >= b) 1 else 0) }
    b
  }

  private def assign(bs: Seq[Long], key: Long): Int = 1 + bs.count(_ < key)

  test("lossless regime reproduces ntile exactly, n divisible or not") {
    val rnd = new scala.util.Random(5)
    Seq(3, 4, 7, 100, 101, 103).foreach { n =>
      val keys = rnd.shuffle((1L to 1000L).toList).take(n)
      val agg = new NtileBoundaries(4, 2048)
      val bs = agg.finish(keys.foldLeft(agg.zero)(agg.reduce))
      val sorted = keys.sorted
      sorted.zipWithIndex.foreach { case (k, i) =>
        assert(assign(bs, k) == ntileOf(i + 1, n, 4), s"n=$n rank=${i + 1}")
      }
    }
  }

  test("fewer rows than buckets: each row its own bucket, like ntile") {
    val agg = new NtileBoundaries(4, 64)
    val bs = agg.finish(Seq(30L, 10L, 20L).foldLeft(agg.zero)(agg.reduce))
    assert(Seq(10L, 20L, 30L).map(assign(bs, _)) == Seq(1, 2, 3))
  }

  test("sketch regime boundaries stay near the exact quartile ranks") {
    val rnd = new scala.util.Random(13)
    val keys = Seq.fill(20000)(rnd.nextLong() >> 12) // well inside 2^53
    val agg = new NtileBoundaries(4, 256)
    val buf = keys.foldLeft(agg.zero)(agg.reduce)
    assert(buf.flips > 0) // genuinely compacted
    val bs = agg.finish(buf)
    val n = keys.size
    val bound = n.toLong * buf.levels.size / 256 // the KLL rank envelope
    bs.zipWithIndex.foreach { case (b, i) =>
      val rank = keys.count(_ < b).toLong
      val want = (i + 1).toLong * n / 4
      assert(math.abs(rank - want) <= bound, s"boundary $i rank $rank vs $want")
    }
  }

  test("composite (value, key) packing preserves lexicographic order") {
    // the ntile_buckets sort key: e2-balance * 2^20 + custkey, including
    // negative balances
    val pairs = Seq((-99999L, 7L), (-99999L, 900L), (-1L, 5L), (0L, 1L),
      (0L, 999999L), (1L, 1L), (999999L, 1048575L))
    val packed = pairs.map { case (e2, k) => e2 * (1L << 20) + k }
    assert(packed == packed.sorted)
    assert(packed.distinct.size == packed.size)
  }

  test("oversized keys are rejected instead of silently losing precision") {
    val agg = new NtileBoundaries(4, 64)
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, (1L << 53) + 1)
    }
  }
}
