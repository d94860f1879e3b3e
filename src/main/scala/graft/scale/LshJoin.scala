package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.VectorOps

/** Euclidean LSH similarity self-join (SURVEY.md §2.3 X3) — the
  * approximate, shuffle-bounded alternative to an all-pairs distance join:
  * vectors land in hash buckets, only same-bucket pairs are scored.
  *
  * Hash family: per table t, an AND-composition of `hashesPerTable`
  * projections h_i(v) = floor(v · u_i / bucketLength) (seeded unit
  * gaussian directions); the table's bucket key is the hash of the tuple.
  * AND-composition is what makes the family selective — one projection of
  * near-orthogonal unit vectors separates poorly (the single-projection
  * form degenerates to ~all-pairs on embedding-shaped data), while k
  * floors jointly shrink the collision probability of far pairs by ^k and
  * `numHashTables` OR-tables hold recall for near pairs. Projection math
  * runs in the codegen'd `vec_dot` kernel against literal vectors — no
  * model fit, no interpreted UDF, no array↔Vector conversion.
  *
  * 100 TB shape: the bucket join shuffles only (id, table, bucket) longs —
  * never vectors; the rerank joins candidates back to the vector table by
  * id (AQE broadcasts the candidate side when small). bucketLength tunes
  * candidates-vs-recall: coarser buckets degenerate toward all-pairs,
  * finer ones lose recall.
  */
object LshJoin {

  /** Deterministic unit-norm gaussian projection directions. */
  def projections(dim: Int, count: Int, seed: Long): Seq[Array[Float]] = {
    val rng = new java.util.Random(seed)
    (0 until count).map { _ =>
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
  }

  /** Approximate self-join: pairs with L2 distance < `threshold`. Output:
    * (a_id, b_id, dist), a_id < b_id, ordered.
    *
    * Defaults sized for ~unit-norm vectors at threshold ≈ 1: 4 projections
    * per table at width 0.25 cut same-bucket far pairs ~3× vs the
    * single-projection family while 10 tables keep recall ≈ 0.7 of the
    * exact sub-threshold set (ScaleSpec pins ≥ 0.5 plus
    * no-false-positives via the exact rerank). */
  def selfJoin(emb: DataFrame, threshold: Double, bucketLength: Double = 0.25,
      numHashTables: Int = 10, hashesPerTable: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = emb.select(size(col(vecCol))).limit(1).collect().headOption match {
      case Some(row) => row.getInt(0)
      case None => // empty input: no pairs, same schema as the joined form
        return emb.limit(0).select(col(idCol).as("a_id"), col(idCol).as("b_id"),
          lit(0.0).as("dist"))
    }
    val projs = projections(dim, numHashTables * hashesPerTable, seed)
    // (id, table, bucket) — one row per hash table per vector; all
    // numHashTables × hashesPerTable projections are computed in ONE pass
    // over the scan, then exploded. The AND-tuple of floors is collapsed
    // to a single long key (a hash collision only adds a false candidate,
    // which the exact rerank removes).
    val bucketCols: Seq[Column] = (0 until numHashTables).map { t =>
      val floors: Seq[Column] = (0 until hashesPerTable).map { i =>
        floor(VectorOps.dot(col(vecCol), lit(projs(t * hashesPerTable + i))) / bucketLength)
      }
      struct(lit(t).as("tbl"), xxhash64(floors: _*).as("bucket"))
    }
    val buckets = emb
      .select(col(idCol).as("id"), explode(array(bucketCols: _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    // exact rerank on candidate pairs only, with the codegen kernel
    val vecs = emb.select(col(idCol), col(vecCol))
    candidates
      .join(vecs.as("va"), col("a_id") === col(s"va.$idCol"))
      .join(vecs.as("vb"), col("b_id") === col(s"vb.$idCol"))
      .select(col("a_id"), col("b_id"),
        sqrt(VectorOps.squaredL2(col(s"va.$vecCol"), col(s"vb.$vecCol"))).as("dist"))
      .filter(col("dist") < threshold)
      .orderBy(col("a_id"), col("b_id"))
  }
}
