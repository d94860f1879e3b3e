package graft

import org.apache.spark.sql.SparkSession

// Throwaway per-leg profiler for ivm_join_view (not part of the suite).
object DebugIvm {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", graft.core.GraftExtensions.Name)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // two timed runs: first pays JIT, second is the steady state
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.queries.StoreQueries.ivmJoinViewProfiled(spark, dir,
        label => println(f"[ivm-debug] run$r ${label}%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s cumulative"))
      println(f"[ivm-debug] run$r TOTAL rows=$n ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
