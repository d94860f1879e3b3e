package graft.scale

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.VectorOps

/** Euclidean LSH similarity self-join (SURVEY.md §2.3 X3) — the
  * approximate, shuffle-bounded alternative to an all-pairs distance join:
  * vectors land in hash buckets, only same-bucket pairs are scored.
  *
  * The hash family comes from MLlib's BucketedRandomProjectionLSH, but the
  * candidate join + exact rerank are explicit DataFrame ops: MLlib's
  * `approxSimilarityJoin` scores candidates with an interpreted ML-Vector
  * UDF, while the explicit form reranks with the codegen'd
  * `vec_squared_l2` kernel — same candidate set (pairs sharing any
  * bucket), same exact distances, faster hot path.
  */
object LshJoin {

  /** Approximate self-join: pairs with L2 distance < `threshold`. Output:
    * (a_id, b_id, dist), a_id < b_id, ordered.
    *
    * bucketLength default: for ~unit-norm vectors the projection spread is
    * O(1); buckets of 0.5 keep same-bucket candidate sets small (coarser
    * buckets degenerate toward an all-pairs join), while 4 tables hold
    * recall up. */
  def selfJoin(emb: DataFrame, threshold: Double, bucketLength: Double = 0.5,
      numHashTables: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withVec = emb.select(col(idCol), array_to_vector(col(vecCol)).as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength)
      .setNumHashTables(numHashTables)
      .setSeed(seed)
      .setInputCol("features")
      .setOutputCol("hashes")
      .fit(withVec)
    // (id, table, bucket) — one row per hash table per vector
    val buckets = model.transform(withVec)
      .select(col(idCol), posexplode(col("hashes")).as(Seq("tbl", "hv")))
      .select(col(idCol).as("id"), col("tbl"),
        vector_to_array(col("hv")).getItem(0).cast("long").as("bucket"))
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
