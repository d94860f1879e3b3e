package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.core.VectorOps

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("sq8 round-trip error is bounded by half a quantization step per dimension") {
    val rows = emb
      .select(col("embedding"), Quantize.sq8Roundtrip(col("embedding")).as("dec"))
      .select(
        // max |orig - decoded| over the vector
        aggregate(zip_with(col("embedding"), col("dec"),
          (x, y) => abs(x.cast("double") - y)), lit(0.0),
          (acc, v) => greatest(acc, v)).as("max_err"),
        ((array_max(col("embedding")).cast("double") -
          array_min(col("embedding")).cast("double")) / 510.0).as("half_step"))
      .as[(Double, Double)].collect()
    rows.foreach { case (err, halfStep) =>
      assert(err <= halfStep + 1e-9, s"err $err > half-step $halfStep")
    }
  }

  test("sq8 codes stay in 0..255 and decode consistently with the fused round-trip") {
    val r = emb.limit(50)
      .select(Quantize.sq8Codes(col("embedding")).as("codes"))
      .select(array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .as[(Int, Int)].collect()
    r.foreach { case (lo, hi) => assert(lo >= 0 && hi <= 255) }
  }

  test("quantized top-13 recalls nearly all of the exact top-13") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).toArray
    val exact = emb
      .withColumn("d", VectorOps.squaredL2(col("embedding"), lit(q)))
      .orderBy(col("d").asc, col("vec_id").asc).limit(13)
      .select("vec_id").as[Long].collect().toSet
    val quantized = graft.queries.ScaleQueries.sq8Topk(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val overlap = exact.intersect(quantized).size
    assert(overlap >= 11, s"sq8 recall too low: $overlap/13")
  }

  test("sign-bit packing sets exactly the bits of the non-negative dims") {
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val row = Seq(Tuple1(v)).toDF("embedding")
      .select(Quantize.signBits(col("embedding"), 0).as("h0"),
        Quantize.signBits(col("embedding"), 32).as("h1"))
      .head()
    var e0 = 0L; var e1 = 0L
    for (i <- 0 until 32) { if (i % 3 == 0) e0 |= 1L << i }
    for (i <- 32 until 64) { if (i % 3 == 0) e1 |= 1L << (i - 32) }
    assert(row.getLong(0) == e0 && row.getLong(1) == e1)
    // zero counts as non-negative (bit set)
    val z = Seq(Tuple1(Array.fill(64)(0.0f))).toDF("embedding")
      .select(Quantize.signBits(col("embedding"), 0).as("h")).head().getLong(0)
    assert(z == -1L >>> 32)
  }

  test("binary-quantized shortlist-50 recalls most of the exact top-10") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).toArray
    val exact = emb
      .withColumn("d", VectorOps.squaredL2(col("embedding"), lit(q)))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val bq = graft.queries.ScaleQueries.bqTopk(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val overlap = exact.intersect(bq).size
    // 1-bit codes keep only direction octants; with a 5× shortlist the
    // rerank recovers most of the true neighbors on this corpus
    assert(overlap >= 6, s"bq recall too low: $overlap/10")
  }
}
