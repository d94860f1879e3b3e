package graft

/** Dev micro-probe for per-job fixed cost in local mode (not part of the
  * suite). Usage: tools/run_class.sh graft.StallProbe [threads] [parts]
  */
object StallProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val parts = if (args.length > 1) args(1) else "32"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 6).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${ts.min}%.3f med=${ts.sorted.apply(3)}%.3f max=${ts.max}%.3f")
    }
    time("rdd count 32 tasks") { sc.parallelize(1 to 1000, 32).count(); () }
    time("rdd count 1 task") { sc.parallelize(1 to 1000, 1).count(); () }
    time("rdd shuffle 32->32") {
      sc.parallelize(1 to 1000, 32).map(i => (i, i)).reduceByKey(_ + _).count(); ()
    }
    time("sql range sum (no shuffle)") { spark.range(1000000L).selectExpr("sum(id)").collect(); () }
    time("sql groupBy shuffle") {
      spark.range(100000L).selectExpr("id % 100 as k", "id as v")
        .groupBy("k").sum("v").count(); ()
    }
    spark.stop()
  }
}
