package graft.core

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sfDir)
    // all pairs (i, i+1) plus self-pairs — enough to exercise the kernels
    e.as("a").join(e.as("b"),
      col("b.vec_id") === col("a.vec_id") + 1 || col("b.vec_id") === col("a.vec_id"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
      .cache()
  }

  test("codegen squaredL2 kernel is bit-identical to the HOF specification") {
    val diff = pairs
      .select(VectorOps.squaredL2(col("x"), col("y")).as("k"),
        VectorOps.squaredL2Hof(col("x"), col("y")).as("h"))
      .filter(col("k") =!= col("h"))
    assert(diff.count() == 0)
  }

  test("codegen dot kernel is bit-identical to the HOF specification") {
    val diff = pairs
      .select(VectorOps.dot(col("x"), col("y")).as("k"),
        VectorOps.dotHof(col("x"), col("y")).as("h"))
      .filter(col("k") =!= col("h"))
    assert(diff.count() == 0)
  }

  test("fused cosine kernel is bit-identical to the composed dot/norm form") {
    val diff = pairs
      .select(VectorOps.cosineSim(col("x"), col("y")).as("k"),
        (VectorOps.dot(col("x"), col("y")) /
          (VectorOps.norm(col("x")) * VectorOps.norm(col("y")))).as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0)
  }

  test("distance invariants: d(x,x)=0, symmetry, cosine self-similarity 1") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val selfD = e.select(VectorOps.squaredL2(col("embedding"), col("embedding")).as("d"))
      .as[Double].collect()
    assert(selfD.forall(_ == 0.0))
    val p = pairs.limit(100)
    val asym = p.select(
      (VectorOps.squaredL2(col("x"), col("y")) - VectorOps.squaredL2(col("y"), col("x"))).as("d"))
      .as[Double].collect()
    assert(asym.forall(_ == 0.0))
    val cos = e.select(VectorOps.cosineSim(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("kernel type check rejects non-float arrays") {
    val bad = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("x", "y")
    val e = intercept[Exception] {
      bad.select(VectorOps.squaredL2(col("x"), col("y"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}
