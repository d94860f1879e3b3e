package graft.core

import org.apache.spark.sql.{Encoders, functions => F}

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("k >= cardinality: exact distinct count under any partitioning") {
    val data = (0L until 5000L).map(_ % 700) // 700 distinct
    (1 to 3).foreach { parts =>
      val got = spark.createDataset(data).repartition(parts * 3)
        .select(new KmvDistinct(1024).toColumn).head()
      assert(got == 700L, s"parts=${parts * 3}")
    }
  }

  test("k << cardinality: estimate within the KMV error envelope") {
    // 20k distinct values, k=256 → std error ≈ 1/sqrt(k-2) ≈ 6.3%; assert
    // a generous 4-sigma band so the (deterministic) draw can't flake
    val data = (0L until 20000L)
    val est = spark.createDataset(data).repartition(8)
      .select(new KmvDistinct(256).toColumn).head()
    assert(math.abs(est - 20000L) < 20000L * 0.25, s"estimate $est")
  }

  test("merge is order-insensitive and duplicate-idempotent") {
    val agg = new KmvDistinct(128)
    val a = (0L until 50L).foldLeft(agg.zero)(agg.reduce)
    val b = (25L until 80L).foldLeft(agg.zero)(agg.reduce)
    val ab = agg.merge(a, b)
    val ba = agg.merge(b, a)
    assert(ab == ba)
    assert(agg.finish(ab) == 80L) // union has 80 distinct < k → exact
    assert(agg.merge(ab, ab) == ab) // idempotent on duplicates
  }

  test("working buffer stays under 2k; compact/finish restore canonical bottom-k") {
    val agg = new KmvDistinct(16)
    val b = (0L until 1000L).foldLeft(agg.zero)(agg.reduce)
    // append-tail form: the working buffer may carry up to k-1 pending
    // appends, but never reaches the 2k compaction threshold
    assert(b.size < 32, s"uncompacted tail exceeded bound: ${b.size}")
    val c = agg.merge(b, agg.zero) // merge compacts to canonical form
    assert(c.size == 16)
    assert(c.sliding(2).forall {
      case Seq(x, y) => java.lang.Long.compareUnsigned(x, y) < 0
      case _ => true
    })
    // canonical form is a pure set function: any reduce/merge schedule
    // equals the bulk build
    assert(c == agg.sketchOf(0L until 1000L))
    val split = agg.merge(
      (0L until 500L).foldLeft(agg.zero)(agg.reduce),
      (500L until 1000L).foldLeft(agg.zero)(agg.reduce))
    assert(split == c)
  }

  test("sketch algebra: exact set ops below k, bounded estimates above") {
    val agg = new KmvDistinct(256)
    val buf = new KmvSketchBuffer(256)
    // lossless regime: union/intersection via inclusion-exclusion exact
    val a = (0L until 150L).foldLeft(buf.zero)(buf.reduce)
    val b = (100L until 260L).foldLeft(buf.zero)(buf.reduce)
    val un = agg.finish(agg.merge(a, b))
    assert(un == 260L)
    assert(agg.finish(a) + agg.finish(b) - un == 50L) // |[100,150)| exact
    // estimation regime: 20k ∪ 20k with 10k shared, k = 256 — union
    // estimate within the ~3/sqrt(k) KMV envelope (~20%, generous)
    val bigA = (0L until 20000L).foldLeft(buf.zero)(buf.reduce)
    val bigB = (10000L until 30000L).foldLeft(buf.zero)(buf.reduce)
    val unEst = agg.finish(agg.merge(bigA, bigB)).toDouble
    assert(math.abs(unEst - 30000.0) / 30000.0 < 0.2, s"union est $unEst")
  }

  test("works as a grouped udaf column") {
    val kmv = F.udaf(new KmvDistinct(512), Encoders.scalaLong)
    val df = Seq((1, 10L), (1, 11L), (1, 10L), (2, 7L)).toDF("g", "v")
    val got = df.groupBy($"g").agg(kmv($"v").as("d")).orderBy($"g")
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 2L), (2, 1L)))
  }
}
