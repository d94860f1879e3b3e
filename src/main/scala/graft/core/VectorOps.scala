package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Distance/similarity primitives over `array<float>` embedding columns.
  *
  * Implements the scoring the reference delegates to Chroma's HNSW index
  * (L2 space — /root/reference/app.py:73-76, app.py:409) as codegen-friendly
  * Catalyst higher-order functions (`zip_with` + `aggregate`), so scoring
  * stays inside whole-stage codegen with no UDF/serialization boundary.
  *
  * Determinism: every element is cast to double before arithmetic and the
  * fold is strictly left-to-right, so a DuckDB oracle computing the same
  * left-to-right fold agrees to the last ulp on the same input. All
  * functions are dimension-agnostic (the reference uses 384-dim MiniLM
  * vectors, the fixtures 64-dim — FIXTURES.md).
  */
object VectorOps {

  private def expr2(a: Column, b: Column, f: (org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression) => org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared Euclidean (L2²) distance — the reference's retrieval metric.
    * Monotone in true L2, so top-k under L2² == top-k under L2; we skip the
    * sqrt in the hot path. Backed by the codegen'd FloatVecSquaredL2
    * kernel; numerically identical to [[squaredL2Hof]]. */
  def squaredL2(a: Column, b: Column): Column = expr2(a, b, FloatVecSquaredL2.apply)

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column = sqrt(squaredL2(a, b))

  /** Dot product (codegen'd kernel, left-to-right double fold). */
  def dot(a: Column, b: Column): Column = expr2(a, b, FloatVecDot.apply)

  /** Higher-order-function form of squaredL2 — kept as the readable
    * specification and as a cross-check that the codegen kernel matches
    * built-in semantics bit for bit (VectorOpsSpec). */
  def squaredL2Hof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** HOF form of dot — see [[squaredL2Hof]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** L2 norm of one vector. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1] — fused single-pass kernel, bit-identical
    * to dot/(norm·norm). NaN-safe for zero vectors is the caller's concern
    * (fixture vectors are non-zero). */
  def cosineSim(a: Column, b: Column): Column = expr2(a, b, FloatVecCosineSim.apply)

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosineSim(a, b)
}
