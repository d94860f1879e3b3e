package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val users: Array[Long] =
    Tables.events(spark, sfDir).select(col("user_id")).as[Long].collect()
  private lazy val truth: Map[Long, Long] =
    users.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  private def sketchOf(depth: Int, width: Int): Array[Long] = {
    val agg = new CountMinAgg(depth, width)
    users.foldLeft(agg.zero)(agg.reduce)
  }

  test("lossless regime: width >= key domain makes every estimate exact") {
    val (depth, width) = (4, 2048)
    val sk = sketchOf(depth, width)
    truth.foreach { case (u, n) =>
      assert(CountMin.estimate(sk, depth, width, u) == n, s"user $u")
    }
  }

  test("upper bound always: estimates never undercount, at any width") {
    for (width <- Seq(4, 16, 64)) {
      val sk = sketchOf(3, width)
      truth.foreach { case (u, n) =>
        assert(CountMin.estimate(sk, 3, width, u) >= n,
          s"undercount at width $width for user $u")
      }
    }
  }

  test("error envelope: overestimate bounded by the classic 2n/w on most keys") {
    val (depth, width) = (4, 64)
    val sk = sketchOf(depth, width)
    val n = users.length.toLong
    val bound = 2 * n / width
    val bad = truth.count { case (u, t) =>
      CountMin.estimate(sk, depth, width, u) - t > bound
    }
    // (1/2)^depth expected fraction; allow generous slack on one fixture
    assert(bad <= math.max(1, truth.size / 4),
      s"$bad of ${truth.size} keys exceed the 2n/w envelope")
  }

  test("merge is elementwise and order-free: split-merge equals single fold") {
    val agg = new CountMinAgg(3, 128)
    val (l, r) = users.splitAt(users.length / 3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val single = users.foldLeft(agg.zero)(agg.reduce)
    assert(merged.toSeq == single.toSeq)
  }

  test("row hashes are deterministic and in range") {
    for (r <- 0 until 4; x <- Seq(0L, 1L, 999999L, -5L, Long.MaxValue)) {
      val i = CountMin.index(r, x, 2048)
      assert(i >= 0 && i < 2048)
      assert(i == CountMin.index(r, x, 2048))
    }
  }
}
