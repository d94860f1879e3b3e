package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class PqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val ivf = Ivf.build(spark, emb)
  private lazy val queryVec = emb.filter(col("vec_id") === 0)
    .select(col("embedding")).head().getSeq[Float](0).toArray

  /** exact squared-L2 brute force, the ground truth for every assert. */
  private lazy val exactDists: Map[Long, Double] =
    emb.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1)
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i).toDouble - queryVec(i).toDouble; d += t * t; i += 1 }
      r.getLong(0) -> d
    }.toMap
  private lazy val exactTop13: Seq[Long] =
    exactDists.toSeq.sortBy { case (id, d) => (d, id) }.take(13).map(_._1)

  test("lossless parameterization reproduces brute-force top-13 through ADC") {
    val idx = Pq.build(ivf, m = 8, ksub = 4096, sampleCap = Int.MaxValue, allowUnboundedSample = true)
    val got = Pq.search(idx, queryVec, k = 13, nprobe = 16, shortlist = 13)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(got == exactTop13)
  }

  test("lossless ADC distances equal exact distances to fp-regrouping") {
    val idx = Pq.build(ivf, m = 8, ksub = 4096, sampleCap = Int.MaxValue, allowUnboundedSample = true)
    val books = idx.cb.books
    val dsub = idx.cb.dsub
    val rows = idx.encoded
      .select(col("vec_id"), col("cell"), col("pq_code")).collect()
    rows.foreach { r =>
      val cell = r.getInt(1)
      val code = r.getSeq[Int](2)
      val centroid = idx.ivf.centroids(cell)
      // per-cell query residual and table lookup, exactly as search builds it
      val qres = Array.tabulate(queryVec.length)(i =>
        queryVec(i).toDouble - centroid(i).toDouble)
      var adist = 0.0
      (0 until books.length).foreach { s =>
        val b = books(s)(code(s))
        var d = 0.0; var i = 0
        while (i < dsub) { val t = qres(s * dsub + i) - b(i); d += t * t; i += 1 }
        adist += d
      }
      val exact = exactDists(r.getLong(0))
      assert(math.abs(adist - exact) <= 1e-9, s"vec ${r.getLong(0)}: $adist vs $exact")
    }
  }

  test("compressed codes (32x smaller) keep high top-13 recall with rerank") {
    val idx = Pq.build(ivf, m = 8, ksub = 256, sampleCap = 2048)
    val got = Pq.search(idx, queryVec, k = 13, nprobe = 16, shortlist = 64)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = exactTop13.count(got).toDouble / 13
    info(f"ivf-pq recall@13 (nprobe=all, shortlist=64): $recall%.3f")
    assert(recall >= 10.0 / 13, f"recall $recall%.3f below floor")
  }

  test("unbounded driver sample requires explicit acknowledgement") {
    val e = intercept[IllegalArgumentException] {
      Pq.build(ivf, m = 8, ksub = 16, sampleCap = Int.MaxValue)
    }
    assert(e.getMessage.contains("allowUnboundedSample"))
  }

  test("codebook fitting is deterministic") {
    val sample = Array.tabulate(300)(i =>
      Array.tabulate(16)(j => math.sin(i * 16 + j) * 10))
    val a = Pq.fitCodebooks(sample, m = 4, ksub = 8)
    val b = Pq.fitCodebooks(sample, m = 4, ksub = 8)
    assert(a.dsub == b.dsub)
    assert(a.books.length == b.books.length)
    a.books.zip(b.books).foreach { case (x, y) =>
      assert(x.length == y.length)
      x.zip(y).foreach { case (u, v) => assert(u.toSeq == v.toSeq) }
    }
  }

  test("small distinct sets collapse to the lossless identity codebook") {
    val sample = Array(
      Array(1.0, 2.0, 3.0, 4.0), Array(1.0, 2.0, 3.0, 4.0),
      Array(5.0, 6.0, 7.0, 8.0))
    val cb = Pq.fitCodebooks(sample, m = 2, ksub = 16)
    // each subspace saw 2 distinct sub-vectors → 2 codebook entries, verbatim
    assert(cb.books.forall(_.length == 2))
    assert(cb.books(0).map(_.toSeq).toSet ==
      Set(Seq(1.0, 2.0), Seq(5.0, 6.0)))
  }

  test("indivisible subspace split and ragged samples are rejected") {
    val sample = Array(Array(1.0, 2.0, 3.0))
    intercept[IllegalArgumentException] { Pq.fitCodebooks(sample, m = 2, ksub = 4) }
    intercept[IllegalArgumentException] {
      Pq.fitCodebooks(Array(Array(1.0, 2.0), Array(1.0)), m = 2, ksub = 4)
    }
  }
}
