package graft.core

import org.apache.spark.sql.{Encoders, functions => F}

import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Qs = Seq(0.25, 0.5, 0.75)

  /** exact quantile_cont on a plain sorted array, the ground truth. */
  private def exactQ(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val pos = q * (s.length - 1)
    val i = math.floor(pos).toInt
    if (i + 1 >= s.length) s.last else s(i) + (pos - i) * (s(i + 1) - s(i))
  }

  /** rank of value v in xs: how many elements are strictly below it. */
  private def rankOf(xs: Seq[Double], v: Double): Long = xs.count(_ < v).toLong

  test("k > n: lossless regime equals exact interpolated quantiles") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(900)(rnd.nextDouble() * 1e4)
    (1 to 3).foreach { parts =>
      val got = spark.createDataset(xs).repartition(parts * 3)
        .select(new KllQuantile(1024, Qs).toColumn).head()
      Qs.zip(got).foreach { case (q, g) =>
        assert(g == exactQ(xs, q), s"q=$q parts=${parts * 3}")
      }
    }
  }

  test("k << n: estimates stay inside the levels/k rank envelope") {
    val rnd = new scala.util.Random(7)
    // uniform and heavily skewed shapes — the envelope is distribution-free
    val shapes = Seq(
      Seq.fill(50000)(rnd.nextDouble()),
      Seq.fill(50000)(math.pow(rnd.nextDouble(), 8.0)))
    val k = 256
    shapes.foreach { xs =>
      val agg = new KllQuantile(k, Seq(0.01, 0.25, 0.5, 0.75, 0.99))
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      val levels = buf.levels.size
      val bound = xs.size.toLong * levels / k // Σ per-level n/k contributions
      agg.finish(buf).zip(Seq(0.01, 0.25, 0.5, 0.75, 0.99)).foreach {
        case (est, q) =>
          val err = math.abs(rankOf(xs, est) - q * (xs.size - 1))
          assert(err <= bound, s"q=$q rank err $err > $bound (levels=$levels)")
      }
    }
  }

  test("weight is conserved across reduces and random merge trees") {
    val rnd = new scala.util.Random(11)
    val agg = new KllQuantile(32, Qs)
    val chunks = Seq.fill(17)(Seq.fill(rnd.nextInt(400))(rnd.nextDouble()))
    // left fold and a random binary merge tree must both retain n weight
    val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    val folded = bufs.reduceLeft(agg.merge)
    val shuffled = rnd.shuffle(bufs).reduceLeft(agg.merge)
    val n = chunks.map(_.size).sum.toLong
    assert(folded.n == n && agg.totalWeight(folded) == n)
    assert(shuffled.n == n && agg.totalWeight(shuffled) == n)
  }

  test("merges below cap stay lossless and order-insensitive in value") {
    val agg = new KllQuantile(64, Qs)
    val a = Seq(5.0, 1.0, 9.0).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(2.0, 8.0).foldLeft(agg.zero)(agg.reduce)
    val ab = agg.finish(agg.merge(a, b))
    val ba = agg.finish(agg.merge(b, a))
    assert(ab == ba)
    assert(ab == Qs.map(q => exactQ(Seq(1.0, 2.0, 5.0, 8.0, 9.0), q)))
  }

  test("deterministic: the same stream builds the identical buffer") {
    val agg = new KllQuantile(16, Qs)
    val xs = Seq.tabulate(500)(i => (i * 37 % 101).toDouble)
    val b1 = xs.foldLeft(agg.zero)(agg.reduce)
    val b2 = xs.foldLeft(agg.zero)(agg.reduce)
    assert(b1 == b2)
  }

  test("per-level buffers stay under 2k after every operation") {
    // k items trigger a compaction immediately, so no level can ever
    // hold 2k: the state bound the 100 TB memory story relies on
    val agg = new KllQuantile(16, Qs)
    val rnd = new scala.util.Random(3)
    var b = agg.zero
    (1 to 2000).foreach { _ =>
      b = agg.reduce(b, rnd.nextDouble())
      assert(b.levels.forall(_.size < 32))
    }
    val merged = agg.merge(b, b)
    assert(merged.levels.forall(_.size < 32))
  }

  test("works as a grouped udaf column in the lossless regime") {
    val kll = F.udaf(new KllQuantile(8, Seq(0.5)), Encoders.scalaDouble)
    val df = Seq((1, 1.0), (1, 3.0), (1, 2.0), (2, 7.0)).toDF("g", "v")
    val got = df.groupBy($"g").agg(kll($"v").as("ps")).orderBy($"g")
      .as[(Int, Seq[Double])].collect().toSeq
    assert(got == Seq((1, Seq(2.0)), (2, Seq(7.0))))
  }
}
