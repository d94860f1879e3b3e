package graft.store

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.Tables

/** Plan evidence for the bucketed co-located join (StoreQueries
  * .bucketedJoin): both sides bucketed+sorted on the join key with equal
  * bucket counts ⇒ the sort-merge join reads matching bucket files with
  * NO shuffle exchange on either side, while the identical join over
  * plain parquet must shuffle both. */
class BucketedSpec extends SparkSpec {

  test("bucketed-by-key join plans without exchanges; unbucketed control shuffles") {
    val ord = Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment"))
    ord.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("graft_test_bkt_ord")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("graft_test_bkt_cust")
    try {
      val bucketed = graft.queries.StoreQueries
        .bucketedJoinFrame(spark, "graft_test_bkt_ord", "graft_test_bkt_cust")
      val bp = bucketed.queryExecution.executedPlan.toString
      assert(bp.contains("SortMergeJoin"), bp)
      assert(!bp.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$bp")
      // control: the same merge join over plain parquet shuffles
      val control = ord.hint("merge").join(cust, col("o_custkey") === col("c_custkey"))
      val cp = control.queryExecution.executedPlan.toString
      assert(cp.contains("Exchange"), s"control should shuffle:\n$cp")
      // and the bucketed layout changes no answer
      assert(bucketed.count() == control.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_bkt_ord")
      spark.sql("DROP TABLE IF EXISTS graft_test_bkt_cust")
    }
  }
}
