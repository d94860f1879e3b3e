package graft.scale

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Euclidean LSH similarity self-join via MLlib's
  * BucketedRandomProjectionLSH (SURVEY.md §2.3 X3) — the approximate,
  * shuffle-bounded alternative to an all-pairs distance join: vectors
  * land in hash buckets, only same-bucket pairs are scored.
  */
object LshJoin {

  /** Approximate self-join: pairs with L2 distance < `threshold`. Output:
    * (a_id, b_id, dist), a_id < b_id, ordered. */
  /** bucketLength default: for ~unit-norm vectors the projection spread is
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
    model
      .approxSimilarityJoin(withVec, withVec, threshold, "dist")
      .select(
        col(s"datasetA.$idCol").as("a_id"),
        col(s"datasetB.$idCol").as("b_id"),
        col("dist"))
      .filter(col("a_id") < col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
