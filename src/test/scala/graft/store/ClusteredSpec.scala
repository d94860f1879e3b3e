package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Clustered layouts: Morton-code algebra against a scalar reference, and
  * the pruning evidence — per-file min/max envelopes (what the parquet
  * footer gives the scan planner) must let a 2-D box skip most files under
  * a Z-ordered layout and cannot skip any under a hash-scattered one. */
class ClusteredSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line scalar Morton interleave, the textbook bit loop. */
  private def mortonRef(x: Int, y: Int): Long = {
    var z = 0L
    (0 until 32).foreach { i =>
      z |= ((x.toLong >> i) & 1L) << (2 * i)
      z |= ((y.toLong >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorder2 matches the scalar bit-interleave reference") {
    val vals = Seq((0, 0), (1, 0), (0, 1), (5, 3), (255, 256), (12345, 67890),
      (Int.MaxValue, 0), (0, Int.MaxValue), (Int.MaxValue, Int.MaxValue))
    val got = vals.toDF("x", "y")
      .select(col("x"), col("y"), Clustered.zorder2(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    vals.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"morton($x, $y)")
    }
  }

  test("zorder2 is monotone in each dimension with the other fixed") {
    val xs = (0 until 1000 by 7).toDF("x")
    val rows = xs.select(Clustered.zorder2(col("x"), lit(42)).as("zx"),
      Clustered.zorder2(lit(42), col("x")).as("zy"), col("x")).orderBy("x").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(0) < b.getLong(0) && a.getLong(1) < b.getLong(1))
    }
  }

  /** Count files whose [min,max] envelope intersects the box — files the
    * scan planner must open; the rest are skipped on stats alone. */
  private def overlapping(path: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long): (Long, Long) = {
    val env = Clustered.fileEnvelopes(spark.read.parquet(path), "x", "y")
    val total = env.count()
    val hit = env.filter(
      col("x_min") < xHi && col("x_max") >= xLo &&
        col("y_min") < yHi && col("y_max") >= yLo).count()
    (hit, total)
  }

  test("Z-ordered layout skips most files for a 2-D box; scattered layout skips none") {
    // 64k points on a 256x256 grid, written 16 ways
    val pts = spark.range(0, 65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).as("y"),
        (col("id") * 31 % 997).as("payload"))
    val zDir = tmpDir("zorder").toString + "/pts"
    val sDir = tmpDir("scatter").toString + "/pts"
    Clustered.writeZOrdered(pts, zDir, 16, col("x"), col("y"))
    pts.repartition(16).write.parquet(sDir) // round-robin: every file spans all of x,y

    // a 32x32 box = 1/64 of the space
    val (zHit, zTotal) = overlapping(zDir, 64, 96, 64, 96)
    val (sHit, sTotal) = overlapping(sDir, 64, 96, 64, 96)
    assert(zTotal == 16 && sTotal == 16)
    assert(sHit == 16, "hash-scattered files all straddle the box — no skips")
    assert(zHit <= 4, s"z-order should confine a 1/64 box to few files, opened $zHit/16")

    // answers are identical regardless of layout
    val q = (p: String) => spark.read.parquet(p)
      .filter(col("x") >= 64 && col("x") < 96 && col("y") >= 64 && col("y") < 96)
      .agg(count(lit(1)), sum("payload")).collect().head.toSeq
    assert(q(zDir) == q(sDir))
  }

  test("range clustering gives tight single-dimension envelopes") {
    val data = spark.range(0, 20000)
      .select(pmod(xxhash64(col("id")), lit(10000)).as("k"), col("id").as("v"))
    val dir = tmpDir("rangecluster").toString + "/t"
    Clustered.writeRangeClustered(data, dir, 10, col("k"))
    val env = Clustered.fileEnvelopes(spark.read.parquet(dir), "k").collect()
    assert(env.length == 10)
    // contiguous, near-disjoint key ranges: total envelope span ~ key span,
    // not 10x the key span as with random placement
    val spans = env.map(r => r.getAs[Long]("k_max") - r.getAs[Long]("k_min"))
    assert(spans.sum < 12000, s"file envelopes should partition the key range, got ${spans.sum}")
    // a narrow range predicate overlaps at most 2 files' envelopes
    val hit = env.count(r => r.getAs[Long]("k_min") < 1500 && r.getAs[Long]("k_max") >= 1000)
    assert(hit <= 2)
  }
}
