package graft.core

import graft.SparkSpec

/** Space-Saving contracts: exactness when m ≥ distinct count (the
  * full-recall parameterization heavy_hitters declares), and the classic
  * approximation guarantees at small m — estimates are upper bounds,
  * over-estimation ≤ n/m per merged summary, and sufficiently frequent
  * terms are never evicted. */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed stream: term t_i appears ~N/i times. */
  private def skewed(n: Int): Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(n / i)(s"t$i"))

  test("m >= distinct count: exact counts, all terms present") {
    val data = skewed(1000)
    val ds = spark.createDataset(new scala.util.Random(1).shuffle(data))
      .repartition(7) // force multi-partition partial aggregation
    val got = ds.select(new SpaceSaving(64).toColumn).head()
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(tc => tc.term -> tc.count).toMap == truth)
    // deterministic presentation order: count desc, term asc
    assert(got == got.sortBy(tc => (-tc.count, tc.term)))
  }

  test("small m: upper-bound estimates with bounded over-estimation, any order") {
    val data = skewed(2000)
    val n = data.size.toLong
    val m = 8
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // the mergeable-summaries guarantees must hold under EVERY ordering
    // and partitioning, not a lucky one — stress several seeded shuffles
    (1 to 5).foreach { seed =>
      val ds = spark.createDataset(new scala.util.Random(seed).shuffle(data)).repartition(4)
      val got = ds.select(new SpaceSaving(m).toColumn).head()
        .map(tc => tc.term -> tc.count).toMap
      got.foreach { case (t, est) =>
        val true_ = truth.getOrElse(t, 0L)
        assert(est >= true_, s"seed $seed: $t undercounted: $est < ${true_}")
        assert(est - true_ <= n / m, s"seed $seed: $t over-estimated beyond n/m")
      }
      // the clear heavy hitter survives and its estimate is an upper bound
      assert(got.contains("t1") && got("t1") >= truth("t1"), s"seed $seed lost t1")
    }
  }

  test("single-partition stream: guaranteed presence above n/m frequency") {
    val data = skewed(1000)
    val n = data.size.toLong
    val m = 8
    // classic guarantee holds exactly for one unmerged summary
    val ss = new SpaceSaving(m)
    val summary = data.foldLeft(ss.zero)(ss.reduce)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.filter(_._2 > n / m).keys.foreach { t =>
      assert(summary.contains(t), s"frequent term $t (> n/m) must be in the summary")
    }
  }
}
