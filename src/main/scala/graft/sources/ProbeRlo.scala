package graft.sources
object ProbeRlo {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .appName("probe").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    val root = java.nio.file.Files.createTempDirectory("rloprobe").toString
    spark.conf.set("spark.sql.catalog.gp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gp.root", root)
    spark.sql("CREATE TABLE gp.u (id BIGINT, grp BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gp.u SELECT id, 0, id * 10 FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO gp.u SELECT id, 1, id * 10 FROM range(100, 200, 1, 1)")
    graft.store.Versioned.analyzeStats(spark, s"$root/u", "id")
    spark.sql("UPDATE gp.u SET v = v + 1 WHERE id < 10")
    graft.store.Versioned.files(s"$root/u").foreach { f =>
      println("FILE " + f)
      println(spark.read.parquet(f).schema.treeString)
      spark.read.parquet(f).show(3)
    }
    spark.stop()
  }
}
